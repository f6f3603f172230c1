"""One-Newton-step equivalence (reference test tier 4,
test_sc_ip_interface.py:427-488): for an equality-constrained quadratic
dynamic problem, a single KKT solve from the initial point must land on the
same point as the monolithic full-space Newton step — the SC decomposition
is an exact elimination, not an approximation.
"""

import numpy as np
import jax.numpy as jnp

import parapint_tpu as pt

T = 3
DT = 0.25


def block_objective(x, p):
    s = x[: T + 1]
    u = x[T + 1 :]
    # strictly convex quadratic
    return jnp.sum((s - 0.3) ** 2) + 0.5 * jnp.sum(u**2)


def block_eq(x, p):
    s = x[: T + 1]
    u = x[T + 1 :]
    dyn = s[1:] - s[:T] - DT * u
    init = jnp.array([s[0] - 1.0])
    return jnp.concatenate([dyn, init])


def make_spec(n_blocks):
    n = 2 * T + 1
    eq_mask = np.ones((n_blocks, T + 1), dtype=bool)
    eq_mask[1:, T] = False
    return pt.DynamicModelSpec(
        num_blocks=n_blocks,
        objective=block_objective,
        eq_constraints=block_eq,
        params={"t0": jnp.zeros(n_blocks)},
        x0=np.zeros((n_blocks, n)),
        eq_mask=eq_mask,
        start_state_idx=[0],
        end_state_idx=[T],
    )


def monolithic_model(n_blocks):
    NT = n_blocks * T

    def obj(v):
        s = v[: NT + 1]
        u = v[NT + 1 :]
        # same objective: interior boundary states appear in two blocks
        total = jnp.sum((s - 0.3) ** 2) + 0.5 * jnp.sum(u**2)
        boundary = s[T::T][: n_blocks - 1]
        total = total + jnp.sum((boundary - 0.3) ** 2)  # double-counted states
        return total

    def eq(v):
        s = v[: NT + 1]
        u = v[NT + 1 :]
        return jnp.concatenate([s[1:] - s[:NT] - DT * u, jnp.array([s[0] - 1.0])])

    return pt.NLPModel(objective=obj, eq_constraints=eq, x0=np.zeros(2 * NT + 1))


def test_single_newton_step_exact():
    """An equality-constrained strictly-convex QP solves exactly in one
    Newton step; the SC-decomposed solve must land on the same solution as
    the monolithic dense solve."""
    n_blocks = 3
    spec = make_spec(n_blocks)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    solver = pt.SchurComplementSolver(block_size=8)
    state = interface.init_state()
    interface._current_state = state
    data = interface.eval_kkt_data(state, 0.0)
    kkt = interface.assemble_kkt(data, 0.0, 0.0)
    solver.symbolic(kkt)
    fact = solver.numeric(kkt)
    assert int(solver.status(fact)) == 0
    sol = solver.solve(fact, interface.kkt_rhs(data))
    deltas = interface.extract_deltas(state, sol, 0.0)
    new_state = interface.apply_step(state, deltas, 1.0, 1.0)

    # monolithic one-step
    mono = monolithic_model(n_blocks)
    mif = pt.InteriorPointInterface(mono)
    msolver = pt.DenseLDLSolver(block_size=16)
    mstate = mif.init_state()
    mif._current_state = mstate
    mdata = mif.eval_kkt_data(mstate, 0.0)
    mfact = msolver.numeric(mif.assemble_kkt(mdata, 0.0, 0.0))
    msol = msolver.solve(mfact, mif.kkt_rhs(mdata))
    mdeltas = mif.extract_deltas(mstate, msol, 0.0)
    mnew = mif.apply_step(mstate, mdeltas, 1.0, 1.0)

    # stitch the SC solution's global state trajectory and compare
    xs = np.asarray(new_state.primals["blocks"])
    traj = [xs[0, : T + 1]]
    for i in range(1, n_blocks):
        traj.append(xs[i, 1 : T + 1])
    s_sc = np.concatenate(traj)
    NT = n_blocks * T
    s_mono = np.asarray(mnew.primals)[: NT + 1]
    assert np.allclose(s_sc, s_mono, atol=1e-9)

    u_sc = xs[:, T + 1 :].reshape(-1)
    u_mono = np.asarray(mnew.primals)[NT + 1 :]
    assert np.allclose(u_sc, u_mono, atol=1e-9)

    # and the point is optimal: feasibility + stationarity in one step
    interface._current_state = new_state
    info = interface.convergence_info(new_state, 0.0)
    assert float(info.primal_inf) < 1e-9
    assert float(info.dual_inf) < 1e-9
