"""Dynamic Schur-complement interface tests.

The reference validates the SC interfaces by solving the same dynamic
problem full-space, serial-SC and MPI-SC and comparing to Ipopt
(/root/reference/parapint/interfaces/schur_complement/tests/test_sc_ip_interface.py:490-568).
Here: the block-decomposed solve must agree with the monolithic full-space
solve of the identical problem, and the sharded solve must agree with the
serial SC solve.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import parapint_tpu as pt

T = 4  # time steps per block
DT = 0.1


def block_objective(x, p):
    # x layout: states s[0..T], controls u[0..T-1]
    s = x[: T + 1]
    u = x[T + 1 :]
    t_local = p["t0"] + DT * jnp.arange(T)
    target = jnp.sin(t_local)
    return DT * jnp.sum((s[:T] - target) ** 2 + 0.1 * u**2)


def block_eq(x, p):
    s = x[: T + 1]
    u = x[T + 1 :]
    dyn = s[1:] - s[:T] - DT * (u - s[:T])  # ds/dt = u - s, implicit in u
    init = jnp.array([s[0] - 0.5])  # only real in block 0 (masked elsewhere)
    return jnp.concatenate([dyn, init])


def make_dynamic_spec(n_blocks):
    n = 2 * T + 1
    t0s = DT * T * np.arange(n_blocks)
    eq_mask = np.ones((n_blocks, T + 1), dtype=bool)
    eq_mask[1:, T] = False  # init-condition row only in block 0
    return pt.DynamicModelSpec(
        num_blocks=n_blocks,
        objective=block_objective,
        eq_constraints=block_eq,
        params={"t0": jnp.asarray(t0s)},
        x0=np.zeros((n_blocks, n)),
        eq_mask=eq_mask,
        start_state_idx=[0],
        end_state_idx=[T],
    )


def make_monolithic(n_blocks):
    # same problem as one NLP: states s[0..N*T], controls u[0..N*T-1]
    NT = n_blocks * T

    def obj(v):
        s = v[: NT + 1]
        u = v[NT + 1 :]
        t = DT * jnp.arange(NT)
        return DT * jnp.sum((s[:NT] - jnp.sin(t)) ** 2 + 0.1 * u**2)

    def eq(v):
        s = v[: NT + 1]
        u = v[NT + 1 :]
        dyn = s[1:] - s[:NT] - DT * (u - s[:NT])
        return jnp.concatenate([dyn, jnp.array([s[0] - 0.5])])

    return pt.NLPModel(objective=obj, eq_constraints=eq, x0=np.zeros(2 * NT + 1))


def solve_dynamic(n_blocks, solver=None, mesh=None):
    spec = make_dynamic_spec(n_blocks)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec, mesh=mesh)
    options = pt.IPOptions()
    options.linalg.solver = solver or pt.SchurComplementSolver(block_size=8)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal
    return interface


def stitch_states(interface, n_blocks):
    """global state trajectory from per-block primals"""
    xs = np.asarray(interface.get_state().primals["blocks"])
    traj = [xs[0, : T + 1]]
    for i in range(1, n_blocks):
        traj.append(xs[i, 1 : T + 1])
    return np.concatenate(traj)


class TestDynamicInterface:
    def test_vs_fullspace(self):
        n_blocks = 3
        interface = solve_dynamic(n_blocks)

        mono = make_monolithic(n_blocks)
        mono_if = pt.InteriorPointInterface(mono)
        options = pt.IPOptions()
        options.linalg.solver = pt.DenseLDLSolver(block_size=16)
        status = pt.ip_solve(mono_if, options)
        assert status == pt.InteriorPointStatus.optimal

        v = np.asarray(mono_if.get_primals())
        NT = n_blocks * T
        s_mono = v[: NT + 1]
        s_sc = stitch_states(interface, n_blocks)
        assert np.allclose(s_sc, s_mono, atol=1e-6)
        obj_sc = float(interface.evaluate_objective())
        obj_mono = float(mono_if.evaluate_objective())
        assert np.isclose(obj_sc, obj_mono, atol=1e-8)

    def test_continuity(self):
        n_blocks = 4
        interface = solve_dynamic(n_blocks)
        xs = np.asarray(interface.get_state().primals["blocks"])
        c = np.asarray(interface.get_coupling_values())
        for i in range(n_blocks - 1):
            # end state of block i == coupling i == start state of block i+1
            assert np.isclose(xs[i, T], c[i], atol=1e-7)
            assert np.isclose(xs[i + 1, 0], c[i], atol=1e-7)

    @pytest.mark.slow
    def test_sharded_matches_serial(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        from jax.sharding import Mesh

        n_blocks = 4
        serial_if = solve_dynamic(n_blocks)

        mesh = Mesh(np.array(jax.devices()[:4]), ("blocks",))
        solver = pt.ShardedSchurComplementSolver(mesh, "blocks", block_size=8)
        sharded_if = solve_dynamic(n_blocks, solver=solver, mesh=mesh)

        assert np.allclose(
            np.asarray(serial_if.get_state().primals["blocks"]),
            np.asarray(sharded_if.get_state().primals["blocks"]),
            atol=1e-10,
        )
        assert np.allclose(
            np.asarray(serial_if.get_coupling_values()),
            np.asarray(sharded_if.get_coupling_values()),
            atol=1e-10,
        )
