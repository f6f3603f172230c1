"""Device-side filter line search (fused path).

The reference's line search is an unimplemented stub
(/root/reference/parapint/algorithms/interior_point.py:320-334, disabled by
default); the fused solver implements IPOPT-style filter acceptance as a
``lax.while_loop``.  These tests check (a) golden problems still solve with
the line search enabled, (b) the filter fixes a problem where full alpha=1
steps oscillate.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import parapint_tpu as pt
from parapint_tpu.linalg import DenseLDLSolver, SchurComplementSolver
from parapint_tpu.models import NLPModel

sys.path.insert(0, "tests")


def _opts_ls(solver, disable=False, max_iter=100):
    o = pt.IPOptions()
    o.max_iter = max_iter
    o.line_search.disable = disable
    o.line_search.step_anyway = True
    o.line_search.max_iter = 10
    o.linalg.solver = solver
    return o


def test_fused_dynamics_with_filter_ls_matches_golden():
    from test_dynamic import make_dynamic_spec

    spec = make_dynamic_spec(6)
    iface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    status, result = pt.ip_solve_fused(
        iface, _opts_ls(SchurComplementSolver(block_size=16))
    )
    assert status == pt.InteriorPointStatus.optimal

    iface2 = pt.DynamicSchurComplementInteriorPointInterface(spec)
    status2, result2 = pt.ip_solve_fused(
        iface2, _opts_ls(SchurComplementSolver(block_size=16), disable=True)
    )
    assert status2 == pt.InteriorPointStatus.optimal
    info = iface.convergence_info(result.state, 0.0, 100.0)
    info2 = iface2.convergence_info(result2.state, 0.0, 100.0)
    assert abs(float(info.objective) - float(info2.objective)) < 1e-8


def test_fused_toy_nlp_with_filter_ls():
    m = NLPModel(
        objective=lambda x: x[0] ** 2 + x[1] ** 2,
        x0=jnp.zeros(2),
        eq_constraints=lambda x: jnp.array([x[1] - jnp.exp(x[0])]),
        ineq_constraints=lambda x: jnp.array([x[1] - (x[0] - 1.0) ** 2]),
        gl=jnp.array([0.0]),
        gu=jnp.array([jnp.inf]),
    )
    iface = pt.InteriorPointInterface(m)
    status, result = pt.ip_solve_fused(iface, _opts_ls(DenseLDLSolver(block_size=8)))
    assert status == pt.InteriorPointStatus.optimal
    # golden x* = 0, y* = 1 (reference test_interior_point.py:36-39)
    x = np.asarray(iface.get_primals())
    assert np.allclose(x, [0.0, 1.0], atol=1e-7)


def _sine_eq_model():
    """Full alpha=1 steps overshoot on this oscillatory equality manifold."""
    return NLPModel(
        objective=lambda x: x[0] ** 2 + (x[1] - 2.0) ** 2,
        x0=jnp.array([3.0, 0.0]),
        eq_constraints=lambda x: jnp.array(
            [x[1] - jnp.sin(5.0 * x[0]) - 2.0 * x[0]]
        ),
    )


def test_filter_ls_fixes_alpha1_oscillation():
    iface_full = pt.InteriorPointInterface(_sine_eq_model())
    s1, r1 = pt.ip_solve_fused(
        iface_full, _opts_ls(DenseLDLSolver(block_size=8), disable=True)
    )
    iface_ls = pt.InteriorPointInterface(_sine_eq_model())
    s2, r2 = pt.ip_solve_fused(
        iface_ls, _opts_ls(DenseLDLSolver(block_size=8), disable=False)
    )
    assert s1 == pt.InteriorPointStatus.optimal
    assert s2 == pt.InteriorPointStatus.optimal
    # the filter damps the overshoot: strictly fewer iterations
    assert int(r2.iterations) < int(r1.iterations), (
        int(r2.iterations),
        int(r1.iterations),
    )


def test_merit_components_shapes():
    from test_dynamic import make_dynamic_spec

    spec = make_dynamic_spec(4)
    iface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    theta, phi = iface.merit_components(iface.init_state(), 0.1)
    assert theta.shape == () and phi.shape == ()
    assert float(theta) >= 0.0 and np.isfinite(float(phi))
