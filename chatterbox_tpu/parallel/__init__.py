from .mesh import make_mesh, MeshAxes
from .sharding import t3_param_sharding, batch_sharding, shard_params

__all__ = ["make_mesh", "MeshAxes", "t3_param_sharding", "batch_sharding", "shard_params"]
