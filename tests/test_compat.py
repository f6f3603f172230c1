"""Reference-name compatibility layer: the reference's call sites work."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_reference_style_call_sites():
    import parapint_tpu as pt
    import parapint_tpu.compat as parapint

    model = pt.NLPModel(
        objective=lambda v: v[0] ** 2 + v[1] ** 2,
        eq_constraints=lambda v: jnp.array([v[1] - jnp.exp(v[0])]),
        x0=jnp.array([0.5, 0.5]),
    )
    interface = parapint.interfaces.InteriorPointInterface(model)
    options = parapint.algorithms.IPOptions()
    options.linalg.solver = parapint.linalg.ScipyInterface(compute_inertia=True)
    status = parapint.algorithms.ip_solve(interface=interface, options=options)
    assert status == parapint.algorithms.InteriorPointStatus.optimal


def test_ma27_alias_warns_on_cntl():
    import parapint_tpu.compat as parapint

    with pytest.warns(UserWarning, match="ignored"):
        solver = parapint.linalg.InteriorPointMA27Interface(
            cntl_options={1: 1e-6}
        )
    mat = jnp.asarray(np.diag([2.0, -1.0, 3.0]))
    fact = solver.numeric(mat)
    pos, neg, zero = solver.inertia(fact)
    assert (int(pos), int(neg), int(zero)) == (2, 1, 0)


def test_sc_solver_alias_signature():
    import parapint_tpu.compat as parapint
    import sys

    sys.path.insert(0, "tests")
    from test_dynamic import make_dynamic_spec
    import parapint_tpu as pt

    interface = parapint.interfaces.MPIDynamicSchurComplementInteriorPointInterface(
        make_dynamic_spec(3)
    )
    solver = parapint.linalg.SchurComplementLinearSolver(
        subproblem_solvers={i: None for i in range(3)},
        schur_complement_solver=None,
        block_size=8,
    )
    options = parapint.algorithms.IPOptions()
    options.linalg.solver = solver
    status = parapint.algorithms.ip_solve(interface=interface, options=options)
    assert status == parapint.algorithms.InteriorPointStatus.optimal
