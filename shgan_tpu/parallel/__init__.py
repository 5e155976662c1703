from .mesh import (create_mesh, replicated, batch_sharding, shard_batch,
                   local_batch_to_global)
from .consistency import check_replicated
