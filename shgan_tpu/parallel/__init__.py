from .mesh import (create_mesh, replicated, batch_sharding, shard_batch,
                   local_batch_to_global)
from .consistency import check_replicated
from .multihost import (maybe_initialize_distributed, is_lead, local_rows,
                        allgather_rows)
