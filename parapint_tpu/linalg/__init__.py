"""Linear solver layer: KKT factorization/solve with inertia.

Mirrors the reference's ``parapint/linalg`` layer
(/root/reference/parapint/linalg/__init__.py): a small solver protocol, a
results/status vocabulary, direct dense solvers (the MA27/MUMPS/Scipy roles)
and Schur-complement solvers (serial and sharded) that compose a sub-solver
per diagonal block with a solver for the Schur complement.
"""

from parapint_tpu.linalg.results import LinearSolverStatus, LinearSolverResults
from parapint_tpu.linalg.base import LinearSolver
from parapint_tpu.linalg.dense import DenseLDLSolver, DenseLUSolver
from parapint_tpu.linalg.schur import (
    SchurComplementSolver,
    BlockKKT,
    LocalBlockKKT,
    BlockRhs,
)
from parapint_tpu.linalg.sharded_schur import ShardedSchurComplementSolver
from parapint_tpu.linalg.host_bk import HostBKSolver
from parapint_tpu.linalg.pcg_schur import PCGSchurComplementSolver
from parapint_tpu.linalg.tridiag import BlockTridiag, BlockTridiagSolver
from parapint_tpu.linalg.banded_schur import (
    BandedLocalBlockKKT,
    BandedSchurComplementSolver,
    ShardedBandedSchurComplementSolver,
)
from parapint_tpu.linalg.condensed import CondensedLSQKKT, CondensedLSQSolver

__all__ = [
    "LinearSolverStatus",
    "LinearSolverResults",
    "LinearSolver",
    "DenseLDLSolver",
    "DenseLUSolver",
    "SchurComplementSolver",
    "ShardedSchurComplementSolver",
    "BlockKKT",
    "LocalBlockKKT",
    "BlockRhs",
    "HostBKSolver",
    "PCGSchurComplementSolver",
    "BlockTridiag",
    "BlockTridiagSolver",
    "BandedLocalBlockKKT",
    "BandedSchurComplementSolver",
    "ShardedBandedSchurComplementSolver",
    "CondensedLSQKKT",
    "CondensedLSQSolver",
]
