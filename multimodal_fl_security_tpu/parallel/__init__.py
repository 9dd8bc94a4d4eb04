"""Device-mesh parallelism: client-axis sharding over TPU meshes."""

from multimodal_fl_security_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_client_arrays,
    client_sharding,
    replicated_sharding,
)
