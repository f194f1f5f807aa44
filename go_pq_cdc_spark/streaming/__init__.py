from .changelog_stream import (  # noqa: F401
    changelog_stream,
    mirror_sink,
    merge_mirror_batch,
)
from .txn_buffer import buffer_streamed_txns  # noqa: F401
