from parapint_tpu.algorithms.interior_point import (
    InteriorPointStatus,
    ip_solve,
    check_convergence,
)
from parapint_tpu.algorithms.fused import ip_solve_fused, make_fused_ip_solve, FusedResult

__all__ = [
    "InteriorPointStatus",
    "ip_solve",
    "check_convergence",
    "ip_solve_fused",
    "make_fused_ip_solve",
    "FusedResult",
]
