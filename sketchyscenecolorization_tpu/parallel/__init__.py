from .mesh import (
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_batch_size,
)
from .prefetch import prefetch_to_device, BackgroundGenerator
