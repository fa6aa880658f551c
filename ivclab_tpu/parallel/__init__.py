from ivclab_tpu.parallel.mesh import make_mesh, frame_sharding, plane_sharding
from ivclab_tpu.parallel.halo import (
    exchange_row_halo,
    motion_search_tile,
    motion_compensate_tile,
    motion_compensate_tile_dense,
)
from ivclab_tpu.parallel.video import (
    ShardedGopStreams,
    assemble_video_payloads,
    build_sharded_video_codec,
    build_sharded_video_encoder,
    shard_frames,
)

__all__ = [
    "make_mesh", "frame_sharding", "plane_sharding",
    "exchange_row_halo", "motion_search_tile", "motion_compensate_tile",
    "motion_compensate_tile_dense",
    "ShardedGopStreams", "assemble_video_payloads",
    "build_sharded_video_codec", "build_sharded_video_encoder", "shard_frames",
]
