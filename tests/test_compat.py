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


def test_ma27_alias_maps_pivot_threshold():
    import parapint_tpu.compat as parapint

    # cntl(1) (pivot threshold) is a mapped knob: accepted without warning,
    # recorded, keeps a refinement pass enabled
    solver = parapint.linalg.InteriorPointMA27Interface(cntl_options={1: 1e-6})
    assert solver.get_cntl(1) == 1e-6
    assert solver.refine_steps >= 1
    mat = jnp.asarray(np.diag([2.0, -1.0, 3.0]))
    fact = solver.numeric(mat)
    pos, neg, zero = solver.inertia(fact)
    assert (int(pos), int(neg), int(zero)) == (2, 1, 0)
    # unmapped cntl keys still warn
    with pytest.warns(UserWarning, match="ignored"):
        parapint.linalg.InteriorPointMA27Interface(cntl_options={7: 3})


def test_mumps_alias_option_mapping():
    import parapint_tpu.compat as parapint

    solver = parapint.linalg.MumpsInterface(
        icntl_options={10: 3, 13: 1, 24: 0}, cntl_options={3: 1e-10}
    )
    # ICNTL(10) (refinement steps) and CNTL(3) (null-pivot threshold) map
    # onto the dense solver's knobs (reference mumps_interface.py:17-60)
    assert solver.refine_steps == 3
    assert solver.zero_tol == 1e-10
    assert solver.get_icntl(10) == 3
    # reference-exact icntl validation (mumps_interface.py:147-155)
    with pytest.raises(ValueError, match="ICNTL\\(13\\)"):
        parapint.linalg.MumpsInterface(icntl_options={13: 0})
    with pytest.raises(ValueError, match="ICNTL\\(24\\)"):
        parapint.linalg.MumpsInterface(icntl_options={24: 1})


def test_mumps_alias_per_solve_logging(caplog):
    import logging
    import parapint_tpu.compat as parapint

    solver = parapint.linalg.MumpsInterface(
        icntl_options={11: 1}, explicit_inverse=True
    )
    assert solver.log_error
    mat = jnp.asarray(np.diag([2.0, -1.0, 3.0]))
    with caplog.at_level(logging.INFO, logger=solver.logger.name):
        fact = solver.numeric(mat)
        x = solver.solve(fact, jnp.ones(3))
    # one diagnostics row per solve: Status, n_null, n_neg, norms, residual
    rows = [r.message for r in caplog.records]
    assert any("0" in r and "e" in r.lower() for r in rows), rows
    assert np.allclose(np.asarray(x), [0.5, -1.0, 1.0 / 3.0])


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
