from .planner import (  # noqa: F401
    Chunk,
    SnapshotPlan,
    plan_integer_range,
    plan_ctid_blocks,
    plan_offset,
    plan_auto,
)
