from .mesh import voxel_mesh, shard_voxels, fit_batch_sharded, pad_to_devices

__all__ = ["voxel_mesh", "shard_voxels", "fit_batch_sharded", "pad_to_devices"]
