from multimodal_neuroimage_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_batch_slice,
    process_allgather,
)
