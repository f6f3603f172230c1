"""Hand-computed KKT entry tests (reference tier 3:
test_sc_ip_interface.py:149-421 writes every matrix entry out longhand).

Tiny dynamic problem, 2 time blocks, 1 state, 1 step per block:
  block vars x = (s0, s1, u); obj = (s0 - a_b)^2 + u^2
  eq rows: [s1 - s0 - u = 0,  (block 0 only) s0 - 0.5 = 0]
  link: start state = s0 (idx 0), end state = s1 (idx 1); 1 coupling var c0.

Per-block KKT layout [x(3), s(0), y_eq(2), y_ineq(0), lam_bwd(1), lam_fwd(1)],
nk = 7; coupling dim ncv = 1.
"""

import numpy as np
import jax.numpy as jnp

import parapint_tpu as pt

A_VALS = np.array([0.3, 0.7])  # per-block objective targets


def objective(x, p):
    return (x[0] - p["a"]) ** 2 + x[2] ** 2


def eq_constraints(x, p):
    return jnp.array([x[1] - x[0] - x[2], x[0] - 0.5])


def make_interface():
    eq_mask = np.array([[True, True], [True, False]])
    spec = pt.DynamicModelSpec(
        num_blocks=2,
        objective=objective,
        eq_constraints=eq_constraints,
        params={"a": jnp.asarray(A_VALS)},
        x0=np.zeros((2, 3)),
        eq_mask=eq_mask,
        start_state_idx=[0],
        end_state_idx=[1],
    )
    return pt.DynamicSchurComplementInteriorPointInterface(spec)


def test_kkt_entries_by_hand():
    interface = make_interface()
    state = interface.init_state()
    interface._current_state = state
    # set a known iterate: primals, duals
    x = np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]])
    c = np.array([0.25])
    y_own = np.array([[0.7, 0.8], [0.9, 0.0]])  # block1 row2 masked -> 0
    lam = np.array([[0.0, 0.11], [0.12, 0.0]])  # [bwd, fwd] per block, masked
    from parapint_tpu.interfaces.base import IPState

    state = IPState(
        primals={"blocks": jnp.asarray(x), "coupling": jnp.asarray(c)},
        slacks=jnp.zeros((2, 0)),
        duals_eq={"own": jnp.asarray(y_own), "link": jnp.asarray(lam)},
        duals_ineq=jnp.zeros((2, 0)),
        duals_primals_lb={"blocks": jnp.zeros((2, 3)), "coupling": jnp.zeros(1)},
        duals_primals_ub={"blocks": jnp.zeros((2, 3)), "coupling": jnp.zeros(1)},
        duals_slacks_lb=jnp.zeros((2, 0)),
        duals_slacks_ub=jnp.zeros((2, 0)),
    )
    mu = 0.1
    data = interface.eval_kkt_data(state, mu)
    w_reg, c_reg = 0.01, 0.001
    kkt = interface.assemble_kkt(data, w_reg, c_reg)
    diag = np.asarray(kkt.diag)
    q = np.asarray(kkt.q)
    rhs = interface.kkt_rhs(data)
    rhs_blocks = np.asarray(rhs.blocks)
    rhs_c = np.asarray(rhs.coupling)

    # ---- expected diagonal block, block 0 -------------------------------
    # layout: [s0, s1, u, y0 (dyn), y1 (init), lam_bwd (masked), lam_fwd]
    K0 = np.zeros((7, 7))
    K0[0, 0] = 2 + w_reg  # d2/ds0^2 of (s0-a)^2
    K0[1, 1] = 0 + w_reg
    K0[2, 2] = 2 + w_reg  # u^2
    J0 = np.array([[-1.0, 1.0, -1.0], [1.0, 0.0, 0.0]])  # dyn row; init row
    K0[3:5, 0:3] = J0
    K0[0:3, 3:5] = J0.T
    K0[3, 3] = K0[4, 4] = -c_reg
    K0[5, 5] = -1.0  # masked backward link row: decoupled -1 diagonal
    K0[6, 1] = K0[1, 6] = 1.0  # forward link row: selects end state s1
    K0[6, 6] = -c_reg
    assert np.allclose(diag[0], K0, atol=1e-12), np.argwhere(
        ~np.isclose(diag[0], K0)
    )

    # ---- expected diagonal block, block 1 -------------------------------
    K1 = np.zeros((7, 7))
    K1[0, 0] = 2 + w_reg
    K1[1, 1] = w_reg
    K1[2, 2] = 2 + w_reg
    J1 = np.array([[-1.0, 1.0, -1.0], [0.0, 0.0, 0.0]])  # init row masked
    K1[3:5, 0:3] = J1
    K1[0:3, 3:5] = J1.T
    K1[3, 3] = -c_reg
    K1[4, 4] = -1.0  # masked eq row
    K1[5, 0] = K1[0, 5] = 1.0  # backward link row: selects start state s0
    K1[5, 5] = -c_reg
    K1[6, 6] = -1.0  # masked forward link row (last block)
    assert np.allclose(diag[1], K1, atol=1e-12)

    # ---- coupling block --------------------------------------------------
    assert np.allclose(q, np.array([[c_reg]]), atol=1e-15)

    # ---- rhs, block 0 ----------------------------------------------------
    # grad_lag_x = grad f + J^T y + F^T lam_fwd   (no bounds -> no barrier)
    grad_f0 = np.array([2 * (0.1 - 0.3), 0.0, 2 * 0.3])
    glx0 = grad_f0 + J0.T @ y_own[0] + np.array([0.0, lam[0, 1], 0.0])
    r0 = np.zeros(7)
    r0[0:3] = -glx0
    r0[3] = -(0.2 - 0.1 - 0.3)  # -dyn residual
    r0[4] = -(0.1 - 0.5)  # -init residual
    r0[5] = 0.0  # masked bwd row
    r0[6] = -(x[0, 1] - c[0])  # -(F x - c): end state s1 vs coupling
    assert np.allclose(rhs_blocks[0], r0, atol=1e-12)

    # ---- rhs, block 1 ----------------------------------------------------
    grad_f1 = np.array([2 * (0.4 - 0.7), 0.0, 2 * 0.6])
    glx1 = grad_f1 + J1.T @ y_own[1] + np.array([lam[1, 0], 0.0, 0.0])
    r1 = np.zeros(7)
    r1[0:3] = -glx1
    r1[3] = -(0.5 - 0.4 - 0.6)
    r1[4] = 0.0  # masked eq row
    r1[5] = -(x[1, 0] - c[0])  # -(B x - c): start state s0 vs coupling
    r1[6] = 0.0  # masked fwd row
    assert np.allclose(rhs_blocks[1], r1, atol=1e-12)

    # ---- coupling rhs: sum of link duals touching c0 ---------------------
    # grad_lag_c = -lam_fwd[0] - lam_bwd[1]; rhs = -grad_lag = lam sum
    assert np.allclose(rhs_c, np.array([lam[0, 1] + lam[1, 0]]), atol=1e-14)

    # ---- border strips ---------------------------------------------------
    border = np.asarray(kkt.border_loc)
    B0 = np.zeros((2, 7))
    B0[1, 6] = -1.0  # block 0's fwd lambda couples c0
    assert np.allclose(border[0], B0)
    B1 = np.zeros((2, 7))
    B1[0, 5] = -1.0  # block 1's bwd lambda couples c0
    assert np.allclose(border[1], B1)
