"""Solver-protocol tests (reference test_linear_solvers.py:63-99 style)."""

import numpy as np
import jax.numpy as jnp
import pytest

from parapint_tpu.linalg import (
    DenseLDLSolver,
    DenseLUSolver,
    LinearSolverStatus,
)


def base_matrix():
    # small symmetric indefinite system with known solutions
    return np.array(
        [[1.0, 7.0, 3.0], [7.0, 4.0, -5.0], [3.0, -5.0, 6.0]]
    )


@pytest.mark.parametrize(
    "solver",
    [DenseLDLSolver(block_size=8), DenseLUSolver(compute_inertia=True)],
    ids=["ldl", "lu"],
)
def test_factor_and_solve(solver):
    mat = jnp.asarray(base_matrix())
    res = solver.symbolic(mat)
    assert res.status == LinearSolverStatus.successful
    fact = solver.numeric(mat)
    assert LinearSolverStatus(int(solver.status(fact))) == LinearSolverStatus.successful
    for x_true in (np.array([1.0, 2.0, 3.0]), np.array([4.0, 2.0, 3.0])):
        rhs = base_matrix() @ x_true
        x = np.asarray(solver.solve(fact, jnp.asarray(rhs)))
        assert np.allclose(x, x_true)


@pytest.mark.parametrize(
    "solver",
    [DenseLDLSolver(block_size=8), DenseLUSolver(compute_inertia=True)],
    ids=["ldl", "lu"],
)
def test_inertia(solver):
    mat = base_matrix()
    fact = solver.numeric(jnp.asarray(mat))
    pos, neg, zero = solver.inertia(fact)
    w = np.linalg.eigvalsh(mat)
    assert int(pos) == (w > 0).sum()
    assert int(neg) == (w < 0).sum()
    assert int(zero) == 0
    res = solver.results(fact)
    assert res.status == LinearSolverStatus.successful
    assert res.inertia == ((w > 0).sum(), (w < 0).sum(), 0)


@pytest.mark.parametrize(
    "solver",
    [DenseLDLSolver(block_size=8), DenseLUSolver(compute_inertia=True)],
    ids=["ldl", "lu"],
)
def test_singular_status(solver):
    mat = np.zeros((3, 3))
    mat[0, 0] = 1.0
    fact = solver.numeric(jnp.asarray(mat))
    assert (
        LinearSolverStatus(int(solver.status(fact))) == LinearSolverStatus.singular
    )
