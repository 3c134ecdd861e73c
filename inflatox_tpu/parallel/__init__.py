from . import distributed
from .mesh import make_mesh, default_mesh
from .solve import sharded_solve_eom_batch
from .sweep import sharded_scan, sharded_scan_ot, parameter_sweep

__all__ = [
    "distributed",
    "make_mesh",
    "default_mesh",
    "sharded_scan",
    "sharded_scan_ot",
    "sharded_solve_eom_batch",
    "parameter_sweep",
]
