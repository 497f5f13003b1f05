"""Device-mesh construction and sharded sampling drivers."""

from basicrta_tpu.parallel.mesh import (
    make_mesh,
    lane_sharding,
    event_sharding,
    deal_columns,
    event_sharded_blocks,
    sharded_training_step,
)

__all__ = [
    "make_mesh",
    "lane_sharding",
    "event_sharding",
    "deal_columns",
    "event_sharded_blocks",
    "sharded_training_step",
]
