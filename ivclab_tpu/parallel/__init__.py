from ivclab_tpu.parallel.mesh import make_mesh, frame_sharding, plane_sharding
from ivclab_tpu.parallel.halo import (
    exchange_row_halo,
    motion_search_tile,
    motion_compensate_tile,
)
from ivclab_tpu.parallel.video import build_sharded_video_encoder, shard_frames

__all__ = [
    "make_mesh", "frame_sharding", "plane_sharding",
    "exchange_row_halo", "motion_search_tile", "motion_compensate_tile",
    "build_sharded_video_encoder", "shard_frames",
]
