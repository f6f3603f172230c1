"""Checkpoint/resume and line-search tests."""

import os

import numpy as np
import jax.numpy as jnp

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


def test_checkpoint_roundtrip(tmp_path):
    from parapint_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    interface = toy_interface()
    state = interface.init_state()
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, barrier=0.05, inertia_coef=1e-8, iteration=7)
    state2, mu, coef, it = load_checkpoint(path, like=interface.init_state())
    assert mu == 0.05 and coef == 1e-8 and it == 7
    for a, b in zip(
        np.asarray(state.primals), np.asarray(state2.primals)
    ):
        assert np.allclose(a, b)


def test_resume_matches_straight_solve(tmp_path):
    path = str(tmp_path / "ip.npz")
    # run few iterations, checkpointing every 2
    i1 = toy_interface()
    o1 = pt.IPOptions()
    o1.max_iter = 4
    o1.linalg.solver = pt.DenseLDLSolver(block_size=8)
    pt.ip_solve(i1, o1, checkpoint_path=path, checkpoint_interval=2)
    assert os.path.exists(path)

    # resume to completion
    i2 = toy_interface()
    o2 = pt.IPOptions()
    o2.linalg.solver = pt.DenseLDLSolver(block_size=8)
    status = pt.ip_solve(i2, o2, resume_from=path)
    assert status == pt.InteriorPointStatus.optimal
    x = np.asarray(i2.get_primals())

    # straight solve for comparison
    i3 = toy_interface()
    o3 = pt.IPOptions()
    o3.linalg.solver = pt.DenseLDLSolver(block_size=8)
    pt.ip_solve(i3, o3)
    assert np.allclose(x, np.asarray(i3.get_primals()), atol=1e-8)


def test_line_search_enabled():
    interface = toy_interface()
    options = pt.IPOptions()
    options.line_search.disable = False
    options.linalg.solver = pt.DenseLDLSolver(block_size=8)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal
    x = np.asarray(interface.get_primals())
    assert np.allclose(x, [0.0, 1.0], atol=1e-6)
