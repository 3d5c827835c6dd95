from chitu_tpu.parallel.mesh import make_mesh, mesh_from_config
from chitu_tpu.parallel.sharding import (
    safe_named_sharding,
    shard_cache,
    shard_params,
)
