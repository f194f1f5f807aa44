"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque `binary` columns + typed metadata struct; all
transforms run as Arrow-batched `mapInPandas` so each task processes
columnar batches without JVM<->Python per-row cost. Codec status:
formats with library-free decoders decode for REAL — PPM P6 + 24-bit
BMP + 8-bit non-interlaced PNG images (stdlib zlib inflate + numpy
per-scanline unfilter — pixel-stat features, nearest-neighbor resize)
PCM-16 WAV audio (duration/RMS/ZCR features, frame-window slicing), and
uncompressed YUV4MPEG2 (.y4m) video (BT.601 YUV->RGB frame decode at
sampled timestamps, middle-frame pixel-stat features). Remaining
COMPRESSED image codecs (JPEG/WebP/... and exotic PNG variants) decode
through an IMPORT-GUARDED Pillow arm (`_try_pil_decode`) where that
library is installed; it is NOT in this container, so there feature
extraction falls back to a deterministic digest fake (tagged in the
vector) and resize raises. Compressed audio/video codecs (MP3/H.264)
would need ffmpeg and remain stubbed. Resized images re-encode as PPM P6
regardless of the decode arm, so outputs never depend on an encoder
library's version. The Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is identical either way and fully tested.

Scale notes: media rows are large — `repartition` by id before mapInPandas
so batches stay under the Arrow batch target, and keep
spark.sql.execution.arrow.maxRecordsPerBatch modest (e.g. 64) for >MB
payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


# -- real numpy codecs for UNCOMPRESSED formats -----------------------------
# PPM (P6), 24-bit BMP and PCM-16 WAV need no external library — header
# parse + numpy frombuffer. Compressed codecs (JPEG/PNG/MP3/H.264) need
# PIL/ffmpeg, which are NOT in this container: those payloads fall back to
# the deterministic digest fake (features) or raise (resize), clearly
# marked. Swapping in a full codec never changes the Spark plan.


_UNRESOLVED = object()
_PIL_IMAGE = _UNRESOLVED


def _pil_image_module():
    """Import-guarded PIL: returns `PIL.Image` where Pillow is installed,
    None otherwise (it is NOT in this container — the digest-fake /
    NotImplementedError boundary stays authoritative there). Cached so
    the per-row kernels never repeat a failed import."""
    global _PIL_IMAGE
    if _PIL_IMAGE is _UNRESOLVED:
        try:
            from PIL import Image  # type: ignore[import-not-found]

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = None
    return _PIL_IMAGE


def _try_pil_decode(payload: bytes):
    """Compressed-codec arm (JPEG/PNG/WebP/...): decode via Pillow to an
    (h, w, 3) uint8 RGB array, or None when Pillow is absent or the
    payload isn't an image it recognizes. NOTE: JPEG decode is only
    bit-stable within one libjpeg build — environments that enable this
    arm should pin Pillow for reproducible features."""
    Image = _pil_image_module()
    if Image is None:
        return None
    import io

    import numpy as np

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, w: int, ch: int):
    """Reconstruct PNG scanlines (filter types 0-4, bit depth 8) from the
    inflated IDAT stream — pure numpy. Sub is a per-lane prefix sum mod
    256; Up is a vectorized row add; Average/Paeth carry a true left
    dependency, so those rows walk pixels with the channel lane
    vectorized. Returns (h, w, ch) uint8, or None on a short stream."""
    import numpy as np

    stride = w * ch
    buf = np.frombuffer(raw, dtype=np.uint8)
    if buf.size < h * (stride + 1):
        return None
    rows = buf[: h * (stride + 1)].reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            cur = np.cumsum(line.reshape(w, ch), axis=0, dtype=np.int64).reshape(
                stride
            ) % 256
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft == 3:  # Average
            cur = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = (line[s] + ((left + prev[s]) >> 1)) % 256
                cur[s] = left
        elif ft == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                up = prev[s]
                p = left + up - upleft
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - up),
                    np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (line[s] + pred) % 256
                cur[s] = left
                upleft = up
        else:
            return None  # invalid filter byte: malformed stream
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def _decode_png(payload: bytes):
    """Stdlib-only PNG decode (zlib inflate + numpy unfilter): 8-bit
    greyscale (0), RGB (2) and RGBA (6, alpha dropped), non-interlaced —
    returns (h, w, 3) uint8. Recognized-but-unsupported PNG variants
    (interlaced, 16-bit, palette, grey+alpha) RAISE NotImplementedError —
    the honest-boundary stance: never silently digest-fake a payload the
    caller believes decodes. Malformed streams (bad chunk walk, zlib
    error, short data) return None like the other codec arms."""
    import struct
    import zlib

    import numpy as np

    pos = len(_PNG_SIG)
    ihdr, idat = None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            return None
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, depth, ctype_v, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if w <= 0 or h <= 0 or comp != 0 or filt != 0:
        return None
    if interlace != 0 or depth != 8 or ctype_v not in (0, 2, 6):
        raise NotImplementedError(
            f"PNG variant not supported by the stdlib decoder (bit depth "
            f"{depth}, color type {ctype_v}, interlace {interlace}): only "
            "8-bit greyscale/RGB/RGBA non-interlaced decode natively; "
            "palette/16-bit/interlaced need the import-guarded Pillow arm"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype_v]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    arr = _png_unfilter(raw, h, w, ch)
    if arr is None:
        return None
    if ch == 1:
        return np.repeat(arr, 3, axis=2)
    if ch == 4:
        return arr[:, :, :3].copy()
    return arr


def decode_image(payload: bytes):
    """Decode an image payload to an (h, w, 3) uint8 array. PPM P6
    (maxval 255), 24-bit uncompressed BMP, and 8-bit non-interlaced PNG
    (greyscale/RGB/RGBA — stdlib zlib + numpy unfilter, deterministic
    across environments) decode with no external library; exotic PNG
    variants raise NotImplementedError (see `_decode_png`); other
    compressed codecs (JPEG/WebP/...) decode through the import-guarded
    Pillow arm where that library exists. Returns None for anything
    else."""
    import numpy as np

    if not payload:
        return None
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        try:
            arr = _decode_png(payload)
        except NotImplementedError:
            # an identifiable PNG in a variant the stdlib decoder refuses:
            # Pillow (where installed) handles palette/16-bit/interlaced;
            # without it, the refusal propagates — honest boundary
            arr = _try_pil_decode(payload)
            if arr is None:
                raise
            return arr
        if arr is not None:
            return arr
        return _try_pil_decode(payload)  # malformed walk: let Pillow try
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
        parts, pos, token = [], 2, b""
        while len(parts) < 3 and pos < len(payload):
            ch = payload[pos : pos + 1]
            pos += 1
            if ch == b"#":  # comment to EOL
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            if ch.isspace():
                if token:
                    if not token.isdigit():  # text that merely starts "P6"
                        return None
                    parts.append(int(token))
                    token = b""
                continue
            token += ch
        if len(parts) != 3 or parts[2] != 255:
            return None
        w, h = parts[0], parts[1]
        if w <= 0 or h <= 0:  # same guard as the BMP branch
            return None
        data = payload[pos : pos + w * h * 3]
        if len(data) < w * h * 3:
            return None
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if payload[:2] == b"BM" and len(payload) >= 54:
        import struct

        off, hdr_sz, w, h, planes, bpp, comp = struct.unpack_from(
            "<IIiiHHI", payload, 10
        )
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        if len(payload) < off + stride * h:
            return None
        rows = np.frombuffer(
            payload[off : off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rows = rows[::-1] if flip else rows
        return rows[:, :, ::-1].copy()  # BGR -> RGB
    return _try_pil_decode(payload)


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 array -> PPM P6 payload."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def decode_audio(payload: bytes):
    """Decode a PCM-16 RIFF/WAVE payload to (samples float64 in [-1, 1),
    sample_rate). Returns None for anything else."""
    import io
    import wave

    import numpy as np

    if not payload or payload[:4] != b"RIFF":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            if wf.getsampwidth() != 2:
                return None
            raw = wf.readframes(wf.getnframes())
            sr = wf.getframerate()
            nch = wf.getnchannels()
    except (wave.Error, EOFError):
        return None
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def _decode_kernel(payload: bytes, kind: str) -> list[float]:
    """Feature extraction: REAL for library-free-decodable payloads —
    images (PPM/BMP/PNG-8): [w, h, aspect, mean R/G/B, luminance std,
    1.0] (channel stats scaled to [0,1]); audio (PCM WAV): [duration_s,
    rms, zero-crossing rate, mean, peak, sample_rate/48k, 0, 2.0].
    video (uncompressed Y4M): image-style stats over the MIDDLE frame
    plus [w, h, aspect, mean R/G/B, lum std, 3.0]. Remaining compressed
    codecs (JPEG/MP3/H.264 — need PIL/ffmpeg, not in this container)
    fall back to the deterministic sha256-digest fake so pipelines
    remain testable end to end; the trailing tag float (1.0 real-image /
    2.0 real-audio / 3.0 real-video / digest bytes otherwise) makes the
    path visible. Identifiable-but-unsupported PNG/Y4M variants RAISE
    from `_decode_png`/`_y4m_parse` rather than silently
    digest-faking."""
    import numpy as np

    if kind == "video":
        vid = _y4m_parse(payload or b"")
        if vid is not None:
            mid = _y4m_frame_rgb(
                payload, vid, len(vid["offsets"]) // 2
            )
            fl = mid.astype(np.float64) / 255.0
            lum = fl.mean(axis=2)
            return [
                float(vid["w"]),
                float(vid["h"]),
                float(vid["w"]) / float(vid["h"]),
                float(fl[:, :, 0].mean()),
                float(fl[:, :, 1].mean()),
                float(fl[:, :, 2].mean()),
                float(lum.std()),
                3.0,
            ]
    img = decode_image(payload or b"") if kind == "image" else None
    if img is not None:
        h, w = img.shape[0], img.shape[1]
        fl = img.astype(np.float64) / 255.0
        lum = fl.mean(axis=2)
        return [
            float(w),
            float(h),
            float(w) / float(h),
            float(fl[:, :, 0].mean()),
            float(fl[:, :, 1].mean()),
            float(fl[:, :, 2].mean()),
            float(lum.std()),
            1.0,
        ]
    aud = decode_audio(payload or b"") if kind == "audio" else None
    if aud is not None:
        x, sr = aud
        dur = len(x) / sr if sr else 0.0
        zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
        return [
            float(dur),
            float(np.sqrt((x**2).mean())) if len(x) else 0.0,
            zcr,
            float(x.mean()) if len(x) else 0.0,
            float(np.abs(x).max()) if len(x) else 0.0,
            sr / 48000.0,
            0.0,
            2.0,
        ]
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(df: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """payload -> (size, content hash, feature vector) via mapInPandas.

    The per-batch loop is vectorized where it can be (sizes, hashes) and
    delegates per-item work to the decode kernel; swapping the stub for a
    real codec does not change the Spark plan."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "content_hash": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": [
                        _decode_kernel(p, k)
                        for p, k in zip(payloads, pdf["kind"])
                    ],
                }
            )

    from .scale import spread_small_input

    # adaptive widening only — media payloads are the most expensive bytes
    # to shuffle, so a wide input must NOT pay a repartition for this
    return (
        spread_small_input(df, F.col("media_id"))
        .select("media_id", "kind", "payload")
        .mapInPandas(op, schema=FEATURE_SCHEMA)
    )


def _resize_kernel(arr, width: int, height: int):
    """Nearest-neighbor resize via numpy index selection (pixel-center
    mapping, the OpenCV INTER_NEAREST convention) — deterministic, no
    codec library needed."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    return arr[rows][:, cols]


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image rows to (width, height): REAL nearest-neighbor resize
    for numpy-decodable payloads (PPM/BMP — output re-encoded as PPM P6,
    meta dims updated), passthrough for non-image rows, and a clear
    NotImplementedError for compressed image codecs (JPEG/PNG need
    PIL/opencv, not in this container). Arrow mapInPandas batches; the
    Spark plan is identical whichever kernel handles a row."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for kind, payload, meta in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                if kind != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                arr = decode_image(payload or b"")
                if arr is None:
                    raise NotImplementedError(
                        "image payload not decodable: PPM/BMP/PNG-8 resize "
                        "natively; other compressed codecs (JPEG/WebP) resize "
                        "only where the import-guarded Pillow arm is installed "
                        "(it is not in this container)"
                    )
                out = _resize_kernel(arr, width, height)
                payloads.append(encode_ppm(out))
                meta = dict(meta) if meta is not None else {}
                meta.update({"mime": "image/x-portable-pixmap",
                             "width": width, "height": height})
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.mapInPandas(op, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("frame_hash", T.StringType(), True),
    ]
)


def _y4m_parse(payload: bytes):
    """Parse an uncompressed YUV4MPEG2 (.y4m) stream header + frame
    index — the public, library-free raw-video interchange format
    (what `ffmpeg ... -f yuv4mpeg2 -` pipes). Returns a dict (w, h,
    fps num/den, chroma mode, frame byte size, per-frame data offsets)
    or None for non-Y4M / malformed / truncated payloads (the
    decode_audio convention). Identifiable-but-unsupported variants
    (exotic chroma samplings, odd dimensions under subsampling) RAISE
    NotImplementedError — the honest-boundary convention `_decode_png`
    set; C420*/C422/C444/Cmono all decode."""
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = 0
    fn, fd = 25, 1  # Y4M default frame rate
    cs = "420jpeg"  # Y4M default chroma sampling
    try:
        for tok in payload[9:nl].split():
            t = tok.decode("ascii")
            if t[:1] == "W":
                w = int(t[1:])
            elif t[:1] == "H":
                h = int(t[1:])
            elif t[:1] == "F":
                a, b = t[1:].split(":")
                fn, fd = int(a), int(b)
            elif t[:1] == "C":
                cs = t[1:]
    except (ValueError, UnicodeDecodeError):
        return None
    if w <= 0 or h <= 0 or fn <= 0 or fd <= 0:
        return None
    # exact 8-bit variant whitelist: a prefix match would route
    # high-bit-depth streams (C420p10/C422p10/...) into the 8-bit frame
    # walk, desync on the FRAME markers, and silently digest-fake —
    # exactly what the honest boundary promises never happens
    if cs in ("420", "420jpeg", "420mpeg2", "420paldv"):
        if w % 2 or h % 2:
            raise NotImplementedError(
                f"y4m C420 requires even dimensions, got {w}x{h}"
            )
        mode, fsz = "420", w * h * 3 // 2
    elif cs == "422":
        if w % 2:
            raise NotImplementedError(
                f"y4m C422 requires even width, got {w}"
            )
        mode, fsz = "422", w * h * 2
    elif cs == "444":
        mode, fsz = "444", w * h * 3
    elif cs == "mono":
        mode, fsz = "mono", w * h
    else:
        raise NotImplementedError(
            f"y4m chroma sampling C{cs} not supported (8-bit C420 "
            "variants/C422/C444/Cmono decode natively; high-bit-depth, "
            "alpha, and C411-class need a real library)"
        )
    offsets = []
    p = nl + 1
    while p < len(payload):
        if payload[p : p + 5] != b"FRAME":
            return None
        e = payload.find(b"\n", p)
        if e < 0 or e + 1 + fsz > len(payload):
            return None
        offsets.append(e + 1)
        p = e + 1 + fsz
    if not offsets:
        return None
    return {
        "w": w, "h": h, "fn": fn, "fd": fd,
        "mode": mode, "fsz": fsz, "offsets": offsets,
    }


def _y4m_frame_rgb(payload: bytes, meta: dict, idx: int):
    """Decode frame `idx` of a parsed Y4M stream to an (h, w, 3) uint8
    RGB array: planar Y/U/V split, nearest-neighbor chroma upsample for
    the subsampled modes, BT.601 full-range matrix (the JPEG/C420jpeg
    convention), round + clip. Pure numpy — deterministic across
    platforms (no libm: the matrix is fixed-literal multiply/add and
    np.round is exact on these magnitudes)."""
    import numpy as np

    w, h = meta["w"], meta["h"]
    off = meta["offsets"][idx]
    buf = np.frombuffer(payload[off : off + meta["fsz"]], dtype=np.uint8)
    ysz = w * h
    y = buf[:ysz].reshape(h, w).astype(np.float64)
    mode = meta["mode"]
    if mode == "mono":
        g8 = np.clip(np.round(y), 0, 255).astype(np.uint8)
        return np.repeat(g8[:, :, None], 3, axis=2)
    if mode == "420":
        cw, ch = w // 2, h // 2
        u = buf[ysz : ysz + cw * ch].reshape(ch, cw)
        v = buf[ysz + cw * ch : ysz + 2 * cw * ch].reshape(ch, cw)
        u = u.repeat(2, axis=0).repeat(2, axis=1)
        v = v.repeat(2, axis=0).repeat(2, axis=1)
    elif mode == "422":
        cw = w // 2
        u = buf[ysz : ysz + cw * h].reshape(h, cw).repeat(2, axis=1)
        v = buf[ysz + cw * h : ysz + 2 * cw * h].reshape(h, cw).repeat(2, axis=1)
    else:  # 444
        u = buf[ysz : 2 * ysz].reshape(h, w)
        v = buf[2 * ysz : 3 * ysz].reshape(h, w)
    u = u.astype(np.float64) - 128.0
    v = v.astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * v, y - 0.344136 * u - 0.714136 * v, y + 1.772 * u],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _frame_kernel(payload: bytes, ts_ms: int, duration_ms: int) -> bytes:
    """STUB (compressed video codecs): the real kernel seeks to `ts_ms`
    and decodes one frame (ffmpeg/pyav — not in this container). The
    deterministic fake slices a 64-byte window whose offset is
    proportional to ts/duration, so outputs are stable, distinct per
    timestamp, and pipeline-testable. Uncompressed Y4M video does NOT
    take this path (`_y4m_frame_rgb` decodes true frames), nor does
    PCM-WAV audio (`_wav_window` slices real samples) — only
    container/codec formats that genuinely need a decoder library
    (H.264/VP9/AV1-class) land here."""
    if not payload:
        return b""
    off = int((ts_ms / max(1, duration_ms)) * max(0, len(payload) - 64))
    return payload[off : off + 64]


def _wav_window(x, sr: int, ts_ms: int, window_ms: int) -> bytes:
    """REAL decode-at-timestamp kernel for PCM audio: slice the
    `window_ms` sample window starting at `ts_ms` from the decoded mono
    stream and re-quantize to PCM16-LE bytes (int16 -> float /32768 ->
    *32768 round-trips exactly, so a mono window is byte-identical to
    the source samples). Clamped at stream end; empty past it."""
    import numpy as np

    start = min(len(x), max(0, int(ts_ms * sr / 1000)))
    end = min(len(x), start + max(1, int(window_ms * sr / 1000)))
    win = np.clip(np.round(np.asarray(x[start:end]) * 32768.0), -32768, 32767)
    return win.astype("<i2").tobytes()


def sample_frames(
    df: DataFrame, n_frames: int = 4, window_ms: int = 25
) -> DataFrame:
    """Uniform temporal frame sampling for timed media (video + audio
    rows): one output row per (media, frame), timestamps at the midpoints
    of `n_frames` equal spans (ts_i = (i + 0.5)/n * duration — the
    standard uniform clip-sampling policy). The sampling policy, kind
    filter, per-frame fan-out, Arrow batching, and output schema are
    real; the decode-at-timestamp kernel is REAL for PCM-WAV audio
    (`_wav_window`: the payload decodes ONCE per row, each frame is the
    true `window_ms` sample window at its timestamp, re-encoded PCM16-LE)
    AND for uncompressed Y4M video (`_y4m_frame_rgb`: the frame whose
    presentation interval covers the timestamp — index floor(ts*fps) —
    decoded to RGB and re-encoded PPM P6; the stream parses ONCE per
    row, only sampled frames decode). A missing meta duration derives
    from the stream itself on both real arms (sample count / frame
    count x frame rate). Compressed video codecs (H.264-class —
    ffmpeg/pyav not in this container) keep the documented
    `_frame_kernel` stub; swapping one in does not change the Spark
    plan.

    Scale: output is n_frames× the media row count but each frame row is
    small; a NARROW input is widened by media_id so one clip's frames stay
    in one task — wide inputs are untouched (payload bytes never shuffle
    for nothing; see scale.spread_small_input)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "ts_ms": [], "frame": [],
                "frame_hash": [],
            }
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                pb = bytes(payload) if payload is not None else b""
                aud = decode_audio(pb)
                vid = None if aud is not None else _y4m_parse(pb)
                # pd.isna first: Arrow nullable ints can land in pandas as
                # NaN (or NA), which dodges both `is None` and `<= 0`
                if pd.isna(dur) or int(dur) <= 0:
                    if aud is not None and aud[1]:
                        dur = max(1, int(len(aud[0]) * 1000 / aud[1]))
                    elif vid is not None:
                        dur = max(
                            1,
                            len(vid["offsets"]) * 1000 * vid["fd"] // vid["fn"],
                        )
                    else:
                        dur = 1
                else:
                    dur = int(dur)
                for i in range(n_frames):
                    ts = int((i + 0.5) * dur / n_frames)
                    if aud is not None:
                        frame = _wav_window(aud[0], aud[1], ts, window_ms)
                    elif vid is not None:
                        nf = len(vid["offsets"])
                        fi = min(nf - 1, ts * vid["fn"] // (1000 * vid["fd"]))
                        frame = encode_ppm(_y4m_frame_rgb(pb, vid, fi))
                    else:
                        frame = _frame_kernel(payload, ts, dur)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["frame"].append(frame)
                    out["frame_hash"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(out)

    from .scale import spread_small_input

    return (
        spread_small_input(
            df.filter(F.col("kind").isin("video", "audio")).select(
                "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
            ),
            F.col("media_id"),
        )
        .mapInPandas(op, schema=FRAME_SCHEMA)
    )


def media_dedup(features: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (same shape as text exact dedup)."""
    return features.groupBy("content_hash").agg(
        F.min("media_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
