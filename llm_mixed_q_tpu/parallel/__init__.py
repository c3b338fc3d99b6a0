from .mesh import batch_spec, make_mesh, shard
from .sharding import param_specs, shard_params
