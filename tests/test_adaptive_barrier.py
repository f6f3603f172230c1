"""Adaptive (LOQO-centrality) barrier strategy — beyond-reference feature.

The reference has only the monotone Fiacco-McCormick rule
(/root/reference/parapint/algorithms/interior_point.py:520-528).  The
adaptive rule must (a) converge to the same solution on the golden
problems, (b) not need more iterations than monotone on the toy problems,
and (c) fall back to monotone when the problem has no finite bounds.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

import parapint_tpu as pt

sys.path.insert(0, "tests")


def toy_interface():
    model = pt.NLPModel(
        objective=lambda v: v[0] ** 2 + v[1] ** 2,
        eq_constraints=lambda v: jnp.array([v[1] - jnp.exp(v[0])]),
        ineq_constraints=lambda v: jnp.array([(v[0] - 1.0) ** 2 - v[1]]),
        gu=jnp.array([0.0]),
        x0=jnp.array([0.0, 0.0]),
    )
    return pt.InteriorPointInterface(model)


def _solve_fused(interface, strategy):
    options = pt.IPOptions()
    options.barrier_strategy = strategy
    options.linalg.solver = pt.DenseLDLSolver(block_size=8)
    status, result = pt.ip_solve_fused(interface, options)
    return status, result


def test_validate_rejects_bad_strategy():
    options = pt.IPOptions()
    options.barrier_strategy = "mehrotra"
    with pytest.raises(ValueError, match="barrier_strategy"):
        options.validate()


def test_adaptive_toy_fused_matches_monotone_solution():
    i_mono = toy_interface()
    s_mono, r_mono = _solve_fused(i_mono, "monotone")
    assert s_mono == pt.InteriorPointStatus.optimal

    i_ad = toy_interface()
    s_ad, r_ad = _solve_fused(i_ad, "adaptive")
    assert s_ad == pt.InteriorPointStatus.optimal
    assert np.allclose(
        np.asarray(i_mono.get_primals()), np.asarray(i_ad.get_primals()),
        atol=1e-7,
    )
    # the centrality rule should not be slower on this well-behaved problem
    assert int(r_ad.iterations) <= int(r_mono.iterations)


def test_adaptive_python_loop_matches_fused():
    i_loop = toy_interface()
    options = pt.IPOptions()
    options.barrier_strategy = "adaptive"
    options.linalg.solver = pt.DenseLDLSolver(block_size=8)
    status = pt.ip_solve(i_loop, options)
    assert status == pt.InteriorPointStatus.optimal

    i_fused = toy_interface()
    _, _ = _solve_fused(i_fused, "adaptive")
    assert np.allclose(
        np.asarray(i_loop.get_primals()), np.asarray(i_fused.get_primals()),
        atol=1e-10,
    )


def test_adaptive_dynamic_golden():
    from test_dynamic import make_dynamic_spec

    spec = make_dynamic_spec(3)
    i_mono = pt.DynamicSchurComplementInteriorPointInterface(spec)
    options = pt.IPOptions()
    options.linalg.solver = pt.SchurComplementSolver(block_size=8)
    status = pt.ip_solve(i_mono, options)
    assert status == pt.InteriorPointStatus.optimal
    x_mono = np.asarray(i_mono.get_state().primals["blocks"])

    spec2 = make_dynamic_spec(3)
    i_ad = pt.DynamicSchurComplementInteriorPointInterface(spec2)
    options2 = pt.IPOptions()
    options2.barrier_strategy = "adaptive"
    options2.linalg.solver = pt.SchurComplementSolver(block_size=8)
    status2, result = pt.ip_solve_fused(i_ad, options2)
    assert status2 == pt.InteriorPointStatus.optimal
    x_ad = np.asarray(i_ad.get_state().primals["blocks"])
    assert np.allclose(x_mono, x_ad, atol=1e-6)


def test_adaptive_no_bounds_falls_back_to_monotone():
    # equality-constrained QP: no inequalities, no bounds -> compl_count == 0;
    # the adaptive rule must defer to the monotone rule and still converge.
    model = pt.NLPModel(
        objective=lambda v: (v[0] - 3.0) ** 2 + (v[1] + 1.0) ** 2,
        eq_constraints=lambda v: jnp.array([v[0] + v[1] - 1.0]),
        x0=jnp.array([0.0, 0.0]),
    )
    interface = pt.InteriorPointInterface(model)
    status, result = _solve_fused(interface, "adaptive")
    assert status == pt.InteriorPointStatus.optimal
    v = np.asarray(interface.get_primals())
    # analytic optimum of min (x-3)^2+(y+1)^2 s.t. x+y=1: x=2.5, y=-1.5
    assert np.allclose(v, [2.5, -1.5], atol=1e-7)
