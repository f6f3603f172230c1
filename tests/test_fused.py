"""Fused (single-dispatch) ip_solve must match the Python-loop solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import parapint_tpu as pt


def toy_interface():
    model = pt.NLPModel(
        objective=lambda v: v[0] ** 2 + v[1] ** 2,
        eq_constraints=lambda v: jnp.array([v[1] - jnp.exp(v[0])]),
        ineq_constraints=lambda v: jnp.array([(v[0] - 1.0) ** 2 - v[1]]),
        gu=jnp.array([0.0]),
        x0=jnp.array([0.0, 0.0]),
    )
    return pt.InteriorPointInterface(model)


def test_fused_toy_matches_loop():
    interface = toy_interface()
    options = pt.IPOptions()
    options.linalg.solver = pt.DenseLDLSolver(block_size=8)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal
    x_loop = np.asarray(interface.get_primals())

    interface2 = toy_interface()
    options2 = pt.IPOptions()
    options2.linalg.solver = pt.DenseLDLSolver(block_size=8)
    status2, result = pt.ip_solve_fused(interface2, options2)
    assert status2 == pt.InteriorPointStatus.optimal
    x_fused = np.asarray(interface2.get_primals())
    assert np.allclose(x_loop, x_fused, atol=1e-12)
    assert float(result.primal_inf) <= options2.tol
    assert int(result.iterations) >= 2


def test_fused_dynamic_matches_loop():
    import sys

    sys.path.insert(0, "tests")
    from test_dynamic import make_dynamic_spec

    spec = make_dynamic_spec(3)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    options = pt.IPOptions()
    options.linalg.solver = pt.SchurComplementSolver(block_size=8)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal
    x_loop = np.asarray(interface.get_state().primals["blocks"])

    spec2 = make_dynamic_spec(3)
    interface2 = pt.DynamicSchurComplementInteriorPointInterface(spec2)
    options2 = pt.IPOptions()
    options2.linalg.solver = pt.SchurComplementSolver(block_size=8)
    status2, result = pt.ip_solve_fused(interface2, options2)
    assert status2 == pt.InteriorPointStatus.optimal
    x_fused = np.asarray(interface2.get_state().primals["blocks"])
    assert np.allclose(x_loop, x_fused, atol=1e-10)


def test_fused_regularized_problem():
    # needs the inertia-correction inner loop (reference test_reg model 2)
    model = pt.NLPModel(
        objective=lambda v: -v[0] ** 2 - v[1] ** 2,
        ineq_constraints=lambda v: jnp.array([v[1] - jnp.exp(-v[0])]),
        gu=jnp.array([0.0]),
        x0=jnp.array([0.1, 0.1]),
        xl=jnp.array([0.0, 0.0]),
        xu=jnp.array([1.0, 1.0]),
    )
    interface = pt.InteriorPointInterface(model)
    options = pt.IPOptions()
    options.linalg.solver = pt.DenseLDLSolver(block_size=8)
    status, result = pt.ip_solve_fused(interface, options)
    assert status == pt.InteriorPointStatus.optimal
    v = np.asarray(interface.get_primals())
    assert np.isclose(v[0], 1.0, atol=1e-6)
    assert np.isclose(v[1], np.exp(-1.0), atol=1e-6)


def test_fused_sharded():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    import sys

    sys.path.insert(0, "tests")
    from jax.sharding import Mesh
    from test_dynamic import make_dynamic_spec

    mesh = Mesh(np.array(jax.devices()[:4]), ("blocks",))
    spec = make_dynamic_spec(4)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec, mesh=mesh)
    options = pt.IPOptions()
    options.linalg.solver = pt.ShardedSchurComplementSolver(mesh, "blocks", block_size=8)
    status, result = pt.ip_solve_fused(interface, options)
    assert status == pt.InteriorPointStatus.optimal
