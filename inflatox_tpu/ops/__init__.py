from .anguelova import (
    complete_analysis_op,
    consistency_only_op,
    consistency_rapidturn_only_op,
    epsilon_v_only_op,
    flag_quantum_diff_op,
)
from .grid import grid_coords, axis_coords
from .pallas_kernels import (
    complete_analysis_pallas,
    complete_analysis_pallas_df64,
    scan_pallas,
    scan_pallas_df64,
)

__all__ = [
    "complete_analysis_pallas",
    "complete_analysis_pallas_df64",
    "scan_pallas",
    "scan_pallas_df64",
    "complete_analysis_op",
    "consistency_only_op",
    "consistency_rapidturn_only_op",
    "epsilon_v_only_op",
    "flag_quantum_diff_op",
    "grid_coords",
    "axis_coords",
]
