"""bench.py output contract (r10 verdict item 1).

BENCH_r10.json was `parsed: null`: the final stdout line grew to ~5 KB
while the driver records only the last ~2000 chars, so the round's
official perf record was lost. The contract now is: diagnostics ride a
sidecar (BENCH_DETAIL.json) and an early stdout line; the FINAL line is a
compact summary hard-bounded at bench.FINAL_LINE_BUDGET. This test pins
the bound with worst-case value widths over the REAL bench query set and
the REAL throughput keys, so adding a bench query that would overflow the
budget fails here, not in the driver's capture window.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# the throughput keys main() emits — keep in sync with throughput_benches/
# poll_decode_benches (the test re-greps bench.py so drift is caught)
_RATE_KEYS = [
    "snapshot_scan",
    "cdc_apply",
    "mirror_cow_state_gg_batch",
    "mirror_cow_bytes_per_batch",
    "mirror_delta_state_gg_batch",
    "mirror_delta_bytes_per_batch",
    "view_update_state_gg_batch",
    "cdc_stream_e2e",
    "poll_decode_wal2json",
    "poll_decode_test_decoding",
]


def test_rate_keys_in_sync_with_bench_source():
    with open(_BENCH, encoding="utf-8") as f:
        src = f.read()
    for key in ("snapshot_scan", "cdc_apply", "cdc_stream_e2e",
                "poll_decode_wal2json", "poll_decode_test_decoding"):
        assert f'"{key}"' in src
    # the f-string mirror keys
    assert 'rates[f"mirror_{mode}_state_gg_batch"]' in src
    assert 'rates[f"mirror_{mode}_bytes_per_batch"]' in src
    assert '"view_update_state_gg_batch"' in src


def test_final_line_fits_driver_capture_at_worst_case_widths():
    bench = _load_bench()
    from go_pq_cdc_spark import plans

    names = sorted(s.name for s in plans.REGISTRY.values() if s.bench)
    assert names, "bench query set is empty"
    # worst case: every query slow (5 digits + 3 decimals), every rate and
    # the byte counters at 10 digits, max steal, agreement > 10
    summary = {
        "metric": "headline_queries_total_runtime",
        "value": 99999.999,
        "unit": "sec",
        "queries": {n: 99999.999 for n in names},
        "throughput_rows_per_sec": {k: 9_999_999_999 for k in _RATE_KEYS},
        "sf": 0.1,
        "value_normalized": 99999.999,
        "ordering_agreement_max": 99.999,
        "steal_jiffies_delta": 9_999_999_999,
        "detail": "BENCH_DETAIL.json",
    }
    line = bench.build_final_line(summary)
    assert len(line) <= bench.FINAL_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_runtime"
    assert set(parsed["queries"]) == set(names)
    assert set(parsed["throughput_rows_per_sec"]) == set(_RATE_KEYS)


def test_final_line_overflow_raises_instead_of_truncating():
    bench = _load_bench()
    with pytest.raises(ValueError, match="BENCH_DETAIL"):
        bench.build_final_line({"pad": "x" * (bench.FINAL_LINE_BUDGET + 1)})


def test_extra_sf_summary_matches_driver_schema_and_stays_off_final_line():
    """r13 verdict item 8: the opt-in $SPARK_GRAFT_BENCH_SF sweep must be
    strictly additive — same summary schema as the final line's driver
    fields, but written to a sidecar/early line, never the final line."""
    bench = _load_bench()
    times = {"q1": 1.234, "q2": 5.678}
    norm = {"q1": 1.0, "q2": 5.0}
    agreement = {"q1": 1.05, "q2": 1.1}
    s = bench.build_extra_sf_summary(times, norm, agreement, 1.0, 42)
    # driver-contract core fields, identical names/semantics
    assert s["metric"] == "headline_queries_total_runtime"
    assert s["unit"] == "sec"
    assert s["queries"] == times
    assert s["value"] == pytest.approx(6.912)
    assert s["sf"] == 1.0
    assert s["value_normalized"] == pytest.approx(6.0)
    assert s["ordering_agreement_max"] == 1.1
    assert s["steal_jiffies_delta"] == 42
    # no keys outside the final-line vocabulary (additions-only contract)
    final_keys = {
        "metric", "value", "unit", "queries", "throughput_rows_per_sec",
        "sf", "value_normalized", "ordering_agreement_max",
        "steal_jiffies_delta", "detail",
    }
    assert set(s) <= final_keys


def test_extra_sf_sweep_is_env_gated_and_before_final_line():
    """The extra sweep must be opt-in (env-gated) and emit before the
    final build_final_line print so the driver's tail capture still ends
    with the sf0.1 contract line."""
    with open(_BENCH, encoding="utf-8") as f:
        src = f.read()
    assert 'os.environ.get("SPARK_GRAFT_BENCH_SF")' in src
    gate = src.index('os.environ.get("SPARK_GRAFT_BENCH_SF")')
    final = src.rindex("build_final_line")
    assert gate < final, "extra-SF sweep must run before the final line"
