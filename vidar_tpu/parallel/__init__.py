from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
from .multihost import (maybe_initialize_distributed, add_distributed_args,
                        global_batch_from_local, put_replicated,
                        process_gather_objects)
