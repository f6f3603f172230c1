"""Solver phase diagnostics (reference parity: the MPI SC solver's internal
timers for form SC / factorize SC / communicate / back solve,
/root/reference/parapint/linalg/schur_complement/mpi_explicit_schur_complement.py:207-360)."""

import numpy as np
import jax.numpy as jnp

import parapint_tpu as pt
from parapint_tpu.linalg.schur import BlockKKT, BlockRhs
from parapint_tpu.utils.profile import solver_phase_breakdown


def _small_kkt(N=3, nk=6, nc=4, seed=0):
    rng = np.random.default_rng(seed)
    diag = rng.normal(size=(N, nk, nk))
    diag = diag + diag.transpose(0, 2, 1) + 8.0 * np.eye(nk)
    border = rng.normal(size=(N, nc, nk)) * 0.1
    q = np.eye(nc) * 5.0
    return BlockKKT(
        diag=jnp.asarray(diag),
        border=jnp.asarray(border),
        q=jnp.asarray(q),
        mask=jnp.ones(N, dtype=bool),
    )


def test_phase_breakdown_reports_both_phases():
    kkt = _small_kkt()
    solver = pt.SchurComplementSolver(block_size=8)
    rhs = BlockRhs(
        blocks=jnp.ones((3, 6)), coupling=jnp.ones(4)
    )
    times = solver_phase_breakdown(solver, kkt, rhs, reps=1)
    assert len(times) == 2
    assert all(t >= 0.0 for t in times.values())


def test_named_scopes_present_in_jaxpr():
    """The solver phases carry jax.named_scope labels (visible to the
    profiler even under whole-solve fusion)."""
    import jax

    kkt = _small_kkt()
    solver = pt.SchurComplementSolver(block_size=8)
    hlo = jax.jit(solver.numeric).lower(kkt).as_text(debug_info=True)
    assert "sc_solver.factor_blocks" in hlo
    assert "sc_solver.form_sc" in hlo
    assert "sc_solver.factor_sc" in hlo
