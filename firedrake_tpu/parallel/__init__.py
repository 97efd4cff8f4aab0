from .spmd import sharded_residual_fn, partition_cells, one_cg_step
from .halo import StripPartition, distributed_residual_fn
from .partition import MeshPartition, SpacePartition, sfc_cell_order
from .dsolve import distributed_solve, DistributedLinearSolver
from .dassemble import DistributedForm

__all__ = ["sharded_residual_fn", "partition_cells", "one_cg_step",
           "StripPartition", "distributed_residual_fn",
           "MeshPartition", "SpacePartition", "sfc_cell_order",
           "distributed_solve", "DistributedLinearSolver",
           "DistributedForm"]
