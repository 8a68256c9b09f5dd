from colbwt_tpu.parallel.mesh import make_mesh, shard_index, shard_reads  # noqa: F401
from colbwt_tpu.parallel.query_sharded import query_batch_sharded  # noqa: F401
from colbwt_tpu.parallel.query_sharded_pos import (  # noqa: F401
    query_batch_sharded_pos,
    shard_pos_tables,
)
from colbwt_tpu.parallel.router import (  # noqa: F401
    choose_sharded_engine,
    query_batch_sharded_auto,
)
