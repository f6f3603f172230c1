"""Heterogeneous (per-block different models) interface tests.

The same sin-tracking dynamic problem is expressed two ways: the uniform
masked spec (test_dynamic) and a genuinely ragged two-kind formulation
(block 0 has one more equality constraint — the initial condition — as a
real structural difference, not a mask).  Solutions must agree.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import parapint_tpu as pt
from parapint_tpu.interfaces.heterogeneous import (
    HeterogeneousDynamicInterface,
    KindSpec,
)

T = 4
DT = 0.1


def objective(x, p):
    s = x[: T + 1]
    u = x[T + 1 :]
    t_local = p["t0"] + DT * jnp.arange(T)
    target = jnp.sin(t_local)
    return DT * jnp.sum((s[:T] - target) ** 2 + 0.1 * u**2)


def eq_first(x, p):  # kind 0: dynamics + initial condition
    s = x[: T + 1]
    u = x[T + 1 :]
    dyn = s[1:] - s[:T] - DT * (u - s[:T])
    return jnp.concatenate([dyn, jnp.array([s[0] - 0.5])])


def eq_interior(x, p):  # kind 1: dynamics only (one fewer constraint)
    s = x[: T + 1]
    u = x[T + 1 :]
    return s[1:] - s[:T] - DT * (u - s[:T])


def build_heterogeneous(n_blocks):
    n = 2 * T + 1
    kinds = [
        KindSpec(
            objective=objective,
            n_x=n,
            eq_constraints=eq_first,
            start_state_idx=[0],
            end_state_idx=[T],
            example_params={"t0": jnp.asarray(0.0)},
        ),
        KindSpec(
            objective=objective,
            n_x=n,
            eq_constraints=eq_interior,
            start_state_idx=[0],
            end_state_idx=[T],
            example_params={"t0": jnp.asarray(0.0)},
        ),
    ]
    kind_of_block = [0] + [1] * (n_blocks - 1)
    params = [{"t0": jnp.asarray(DT * T * float(b))} for b in range(n_blocks)]
    x0 = [np.zeros(n) for _ in range(n_blocks)]
    return HeterogeneousDynamicInterface(kinds, kind_of_block, params, x0)


def test_matches_uniform_masked_formulation():
    import sys

    sys.path.insert(0, "tests")
    from test_dynamic import make_dynamic_spec

    n_blocks = 3
    het = build_heterogeneous(n_blocks)
    options = pt.IPOptions()
    options.linalg.solver = pt.SchurComplementSolver(block_size=8)
    status = pt.ip_solve(het, options)
    assert status == pt.InteriorPointStatus.optimal

    uni = pt.DynamicSchurComplementInteriorPointInterface(make_dynamic_spec(n_blocks))
    o2 = pt.IPOptions()
    o2.linalg.solver = pt.SchurComplementSolver(block_size=8)
    status2 = pt.ip_solve(uni, o2)
    assert status2 == pt.InteriorPointStatus.optimal

    xh = np.asarray(het.get_state().primals["blocks"])
    xu_ = np.asarray(uni.get_state().primals["blocks"])
    assert np.allclose(xh, xu_, atol=1e-7)
    assert np.isclose(
        float(het.evaluate_objective()), float(uni.evaluate_objective()), atol=1e-9
    )


def test_truly_ragged_dims():
    """Blocks of different variable counts: last block has an extra
    regularized variable that the others lack."""
    n = 2 * T + 1

    def obj_extra(x, p):
        return objective(x[:n], p) + 0.5 * x[n] ** 2

    def eq_extra(x, p):
        return eq_interior(x[:n], p)

    kinds = [
        KindSpec(
            objective=objective, n_x=n, eq_constraints=eq_first,
            start_state_idx=[0], end_state_idx=[T],
            example_params={"t0": jnp.asarray(0.0)},
        ),
        KindSpec(
            objective=objective, n_x=n, eq_constraints=eq_interior,
            start_state_idx=[0], end_state_idx=[T],
            example_params={"t0": jnp.asarray(0.0)},
        ),
        KindSpec(
            objective=obj_extra, n_x=n + 1, eq_constraints=eq_extra,
            start_state_idx=[0], end_state_idx=[T],
            example_params={"t0": jnp.asarray(0.0)},
        ),
    ]
    n_blocks = 3
    kind_of_block = [0, 1, 2]
    params = [{"t0": jnp.asarray(DT * T * float(b))} for b in range(n_blocks)]
    x0 = [np.zeros(n), np.zeros(n), np.zeros(n + 1)]
    interface = HeterogeneousDynamicInterface(kinds, kind_of_block, params, x0)
    options = pt.IPOptions()
    options.linalg.solver = pt.SchurComplementSolver(block_size=8)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal
    xs = np.asarray(interface.get_state().primals["blocks"])
    # the extra variable is pulled to 0 by its quadratic penalty
    assert abs(xs[2, n]) < 1e-6
    # continuity still holds
    c = np.asarray(interface.get_coupling_values())
    assert np.isclose(xs[0, T], c[0], atol=1e-7)
    assert np.isclose(xs[1, 0], c[0], atol=1e-7)


def test_heterogeneous_fused():
    """The fused solver's shared-AD path must work with multi-kind families."""
    het = build_heterogeneous(3)
    options = pt.IPOptions()
    options.linalg.solver = pt.SchurComplementSolver(block_size=8)
    status, result = pt.ip_solve_fused(het, options)
    assert status == pt.InteriorPointStatus.optimal
    assert float(result.primal_inf) <= options.tol
