from .changelog_stream import (  # noqa: F401
    changelog_stream,
    merge_mirror_batch,
    mirror_sink,
    multi_mirror_sink,
    read_mirror,
)
from .txn_buffer import buffer_streamed_txns  # noqa: F401
