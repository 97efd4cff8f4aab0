from .spmd import sharded_residual_fn, partition_cells, one_cg_step
from .halo import StripPartition, distributed_residual_fn

__all__ = ["sharded_residual_fn", "partition_cells", "one_cg_step",
           "StripPartition", "distributed_residual_fn"]
