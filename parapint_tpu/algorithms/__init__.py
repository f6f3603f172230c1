from parapint_tpu.algorithms.interior_point import (
    InteriorPointStatus,
    ip_solve,
    check_convergence,
)

__all__ = ["InteriorPointStatus", "ip_solve", "check_convergence"]
