from .mesh import (
    fit_batch_sharded,
    fit_fused_sharded,
    pad_to_devices,
    shard_voxels,
    voxel_mesh,
)

__all__ = ["voxel_mesh", "shard_voxels", "fit_batch_sharded",
           "fit_fused_sharded", "pad_to_devices"]
