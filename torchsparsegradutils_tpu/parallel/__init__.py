from .sharding import (RowShardedMatrix, local_shard_spmm, shard_rows,
                       sharded_sparse_mm)
from .chunk_sharded import (ShardedChunkPlan, build_sharded_chunk_plan,
                            sharded_chunk_spmm)
from .dia_sharded import matvec_closures, sharded_dia_spmm
from .training import init_params, loss_fn, make_model, make_train_step

__all__ = [
    "RowShardedMatrix",
    "local_shard_spmm",
    "shard_rows",
    "sharded_sparse_mm",
    "init_params",
    "loss_fn",
    "make_model",
    "make_train_step",
    "ShardedChunkPlan",
    "build_sharded_chunk_plan",
    "sharded_chunk_spmm",
    "sharded_dia_spmm",
    "matvec_closures",
]
