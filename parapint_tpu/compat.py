"""Reference-name compatibility layer.

``import parapint_tpu.compat as parapint`` gives user code the reference's
public names (/root/reference/parapint/*/__init__.py) mapped onto this
framework's TPU-native classes, for near-drop-in porting:

    import parapint_tpu.compat as parapint
    options = parapint.algorithms.IPOptions()
    options.linalg.solver = parapint.linalg.ScipyInterface(compute_inertia=True)
    status = parapint.algorithms.ip_solve(interface, options)

Model construction necessarily differs (pure JAX functions instead of Pyomo
models — see DynamicModelSpec / StochasticModelSpec / NLPModel), but solver
and algorithm call sites carry over.
"""

import types
import warnings

import parapint_tpu as _pt
from parapint_tpu.linalg import (
    DenseLDLSolver as _DenseLDLSolver,
    DenseLUSolver as _DenseLUSolver,
    SchurComplementSolver as _SchurComplementSolver,
    ShardedSchurComplementSolver as _ShardedSchurComplementSolver,
)


class ScipyInterface(_DenseLUSolver):
    """Reference ``parapint.linalg.ScipyInterface`` (scipy_interface.py:11):
    LU with optional dense-eigenvalue inertia."""

    def __init__(self, compute_inertia: bool = False):
        super().__init__(compute_inertia=compute_inertia)


def _warn_ignored(name, kwargs):
    ignored = {k: v for k, v in kwargs.items() if v}
    if ignored:
        warnings.warn(
            f"{name}: native solver options {sorted(ignored)} have no direct "
            f"equivalent on the TPU dense factorization and are ignored; see "
            f"DenseLDLSolver for the available knobs",
            stacklevel=3,
        )


class InteriorPointMA27Interface(_DenseLDLSolver):
    """Reference ``parapint.linalg.InteriorPointMA27Interface``
    (ma27_interface.py:9): symmetric indefinite factorization + inertia.
    cntl/icntl passthrough options are MA27-specific and ignored."""

    def __init__(self, cntl_options=None, icntl_options=None, **kwargs):
        _warn_ignored("InteriorPointMA27Interface", dict(cntl=cntl_options, icntl=icntl_options))
        super().__init__(**kwargs)


class MumpsInterface(_DenseLDLSolver):
    """Reference ``parapint.linalg.MumpsInterface`` (mumps_interface.py:11)."""

    def __init__(self, par=1, comm=None, cntl_options=None, icntl_options=None, **kwargs):
        _warn_ignored("MumpsInterface", dict(cntl=cntl_options, icntl=icntl_options))
        super().__init__(**kwargs)


class SchurComplementLinearSolver(_SchurComplementSolver):
    """Reference ``parapint.linalg.SchurComplementLinearSolver``
    (explicit_schur_complement.py:16).  The reference takes one solver
    object per diagonal block; on TPU the blocks are factored by one
    batched kernel, so per-block solver objects are accepted for signature
    compatibility but only the schur_complement_solver is used."""

    def __init__(self, subproblem_solvers=None, schur_complement_solver=None, **kwargs):
        super().__init__(schur_complement_solver=schur_complement_solver, **kwargs)


class MPISchurComplementLinearSolver(_ShardedSchurComplementSolver):
    """Reference ``parapint.linalg.MPISchurComplementLinearSolver``
    (mpi_explicit_schur_complement.py:128).  Takes a jax Mesh instead of an
    implicit MPI.COMM_WORLD."""

    def __init__(
        self,
        subproblem_solvers=None,
        schur_complement_solver=None,
        mesh=None,
        axis_name: str = "blocks",
        **kwargs,
    ):
        if mesh is None:
            raise ValueError(
                "MPISchurComplementLinearSolver requires mesh= (the TPU "
                "analogue of the MPI communicator)"
            )
        super().__init__(
            mesh,
            axis_name,
            schur_complement_solver=schur_complement_solver,
            **kwargs,
        )


# interface aliases: parallelism is a mesh argument, not a class
MPIDynamicSchurComplementInteriorPointInterface = (
    _pt.DynamicSchurComplementInteriorPointInterface
)
MPIStochasticSchurComplementInteriorPointInterface = (
    _pt.StochasticSchurComplementInteriorPointInterface
)

linalg = types.SimpleNamespace(
    LinearSolverInterface=_pt.LinearSolver,
    LinearSolverResults=_pt.LinearSolverResults,
    LinearSolverStatus=_pt.LinearSolverStatus,
    ScipyInterface=ScipyInterface,
    InteriorPointMA27Interface=InteriorPointMA27Interface,
    MumpsInterface=MumpsInterface,
    SchurComplementLinearSolver=SchurComplementLinearSolver,
    MPISchurComplementLinearSolver=MPISchurComplementLinearSolver,
)

interfaces = types.SimpleNamespace(
    BaseInteriorPointInterface=_pt.interfaces.base.BaseInteriorPointInterface,
    InteriorPointInterface=_pt.InteriorPointInterface,
    DynamicSchurComplementInteriorPointInterface=_pt.DynamicSchurComplementInteriorPointInterface,
    StochasticSchurComplementInteriorPointInterface=_pt.StochasticSchurComplementInteriorPointInterface,
    MPIDynamicSchurComplementInteriorPointInterface=MPIDynamicSchurComplementInteriorPointInterface,
    MPIStochasticSchurComplementInteriorPointInterface=MPIStochasticSchurComplementInteriorPointInterface,
)

algorithms = types.SimpleNamespace(
    InteriorPointStatus=_pt.InteriorPointStatus,
    IPOptions=_pt.IPOptions,
    ip_solve=_pt.ip_solve,
)
