"""Multi-chip parallelism: shard_map rendering over a device mesh."""

from ceres_tpu.parallel.sharded import (
    device_mesh,
    render_sharded,
    render_frames_sharded,
)

__all__ = ["device_mesh", "render_sharded", "render_frames_sharded"]
