from .mesh import make_mesh, shard_batch, replicate, shard_params_batch_axis

__all__ = ["make_mesh", "shard_batch", "replicate", "shard_params_batch_axis"]
