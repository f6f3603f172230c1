"""Interior-point interfaces: function evaluation + KKT assembly.

Mirrors the role of the reference's ``parapint/interfaces`` layer
(/root/reference/parapint/interfaces/__init__.py): the single-NLP interface
and the dynamic / stochastic Schur-complement interfaces.  Parallel (MPI)
variants are not separate classes here: the same structured interfaces run
sharded by handing the Schur-complement solver a device mesh
(:class:`parapint_tpu.linalg.ShardedSchurComplementSolver`).
"""

from parapint_tpu.interfaces.base import IPState, Bounds
from parapint_tpu.interfaces.single import InteriorPointInterface
from parapint_tpu.interfaces.dynamic import (
    DynamicModelSpec,
    DynamicSchurComplementInteriorPointInterface,
)
from parapint_tpu.interfaces.stochastic import (
    StochasticModelSpec,
    StochasticSchurComplementInteriorPointInterface,
)
from parapint_tpu.interfaces.heterogeneous import (
    KindSpec,
    HeterogeneousDynamicInterface,
)

__all__ = [
    "IPState",
    "Bounds",
    "InteriorPointInterface",
    "DynamicModelSpec",
    "DynamicSchurComplementInteriorPointInterface",
    "StochasticModelSpec",
    "StochasticSchurComplementInteriorPointInterface",
    "KindSpec",
    "HeterogeneousDynamicInterface",
]
