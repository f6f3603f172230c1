"""Round-2 fixes: PCG status propagation, auto-padded block counts,
checkpoint validation, fused failure-state preservation."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import parapint_tpu as pt
from parapint_tpu.linalg import (
    BlockKKT,
    LinearSolverStatus,
    PCGSchurComplementSolver,
    SchurComplementSolver,
    ShardedSchurComplementSolver,
)
from parapint_tpu.linalg.schur import BlockRhs, LocalBlockKKT, pad_block_count

sys.path.insert(0, "tests")


def make_local_system(N=2, nk=8, L=3, q_scale=1.0, seed=0):
    """LocalBlockKKT with SPD diagonal blocks and shared coupling rows.

    S = q_scale*I - sum_i A_i K_i^{-1} A_i^T: large q_scale makes the SC
    positive definite, negative q_scale makes it negative definite.
    """
    rng = np.random.default_rng(seed)
    diag = np.zeros((N, nk, nk))
    border_loc = np.zeros((N, L, nk))
    for i in range(N):
        A = rng.standard_normal((nk, nk))
        diag[i] = A @ A.T + nk * np.eye(nk)
        border_loc[i] = rng.standard_normal((L, nk))
    row_idx = np.tile(np.arange(L, dtype=np.int32), (N, 1))
    q = q_scale * np.eye(L)
    return LocalBlockKKT.make(
        jnp.asarray(diag),
        jnp.asarray(border_loc),
        row_idx,
        jnp.asarray(q),
        assembly="shared",
    )


def test_pcg_negative_curvature_sets_singular():
    kkt = make_local_system(q_scale=-5.0)
    pcg = PCGSchurComplementSolver(block_size=8)
    fact = pcg.numeric(kkt)
    # factorization itself is fine (SPD blocks)...
    assert int(pcg.status(fact)) == int(LinearSolverStatus.successful)
    rhs = BlockRhs(
        blocks=jnp.ones(kkt.diag.shape[:2]), coupling=jnp.ones(kkt.q.shape[0])
    )
    # ...but the solve hits negative curvature (SC is negative definite)
    sol, status = pcg.solve_with_status(fact, rhs)
    assert int(status) == int(LinearSolverStatus.singular)
    # plain solve() NaN-poisons instead of returning a bogus step
    bad = pcg.solve(fact, rhs)
    assert np.all(np.isnan(np.asarray(bad.coupling)))
    assert np.all(np.isnan(np.asarray(bad.blocks)))


def test_pcg_maxiter_starved_sets_error():
    kkt = make_local_system(q_scale=1000.0, N=3, nk=12, L=6, seed=3)
    pcg = PCGSchurComplementSolver(block_size=8, cg_maxiter=1, cg_tol=1e-14)
    fact = pcg.numeric(kkt)
    rhs = BlockRhs(
        blocks=jnp.ones(kkt.diag.shape[:2]), coupling=jnp.ones(kkt.q.shape[0])
    )
    sol, status = pcg.solve_with_status(fact, rhs)
    assert int(status) == int(LinearSolverStatus.error)
    # a converging configuration still reports success
    pcg_ok = PCGSchurComplementSolver(block_size=8, cg_maxiter=200)
    fact_ok = pcg_ok.numeric(kkt)
    sol_ok, status_ok = pcg_ok.solve_with_status(fact_ok, rhs)
    assert int(status_ok) == int(LinearSolverStatus.successful)
    assert not np.any(np.isnan(np.asarray(sol_ok.coupling)))


def test_ip_solve_raises_on_failed_pcg_solve():
    from test_dynamic import make_dynamic_spec

    spec = make_dynamic_spec(3)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    options = pt.IPOptions()
    options.linalg.solver = PCGSchurComplementSolver(
        block_size=16, cg_maxiter=0
    )
    with pytest.raises(RuntimeError, match="back solve failed"):
        pt.ip_solve(interface, options)


def test_fused_keeps_state_on_failed_solve():
    from test_dynamic import make_dynamic_spec

    spec = make_dynamic_spec(3)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    options = pt.IPOptions()
    options.linalg.solver = PCGSchurComplementSolver(
        block_size=16, cg_maxiter=0
    )
    status, result = pt.ip_solve_fused(interface, options)
    assert status == pt.InteriorPointStatus.error
    # the error result carries the incoming (last valid) iterate, not a
    # NaN-poisoned one
    state0 = interface.init_state()
    for a, b in zip(
        jax.tree_util.tree_leaves(result.state),
        jax.tree_util.tree_leaves(state0),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))


# -- auto-padded block counts ------------------------------------------------


def _dense_solution(diag, border, q, rhs_blocks, rhs_coupling):
    from test_schur import dense_assemble

    M = dense_assemble(np.asarray(diag), np.asarray(border), np.asarray(q))
    r = np.concatenate([np.asarray(rhs_blocks).ravel(), np.asarray(rhs_coupling)])
    return np.linalg.solve(M, r)


@pytest.mark.parametrize(
    "N", [pytest.param(7, marks=pytest.mark.slow), 5]
)
def test_sharded_auto_pads_nondivisible_blocks(N):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh
    from test_schur import make_system

    nk, nc = 12, 5
    diag, border, q = make_system(N, nk, nc, seed=N)
    rng = np.random.default_rng(2)
    rhs_blocks = rng.standard_normal((N, nk))
    rhs_coupling = rng.standard_normal(nc)
    expected = _dense_solution(diag, border, q, rhs_blocks, rhs_coupling)

    mesh = Mesh(np.array(jax.devices()[:4]), ("blocks",))
    solver = ShardedSchurComplementSolver(mesh=mesh, block_size=16)
    kkt = BlockKKT.make(jnp.asarray(diag), jnp.asarray(border), jnp.asarray(q))
    assert solver.symbolic(kkt).status == LinearSolverStatus.successful
    fact = solver.numeric(kkt)
    assert int(solver.status(fact)) == int(LinearSolverStatus.successful)
    sol = solver.solve(
        fact,
        BlockRhs(blocks=jnp.asarray(rhs_blocks), coupling=jnp.asarray(rhs_coupling)),
    )
    got = np.concatenate([np.asarray(sol.blocks).ravel(), np.asarray(sol.coupling)])
    assert sol.blocks.shape == (N, nk)
    assert np.allclose(got, expected, rtol=1e-7, atol=1e-7)
    # inertia excludes the padding blocks
    pos, neg, zero = solver.inertia(fact)
    serial = SchurComplementSolver(block_size=16)
    sfact = serial.numeric(kkt)
    spos, sneg, szero = serial.inertia(sfact)
    assert (int(pos), int(neg), int(zero)) == (int(spos), int(sneg), int(szero))


@pytest.mark.slow
def test_pcg_sharded_auto_pads():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("blocks",))
    kkt = make_local_system(q_scale=500.0, N=7, nk=8, L=3, seed=1)
    rhs = BlockRhs(blocks=jnp.ones((7, 8)), coupling=jnp.ones(3))
    serial = PCGSchurComplementSolver(block_size=8)
    s_sol, s_status = serial.solve_with_status(serial.numeric(kkt), rhs)
    assert int(s_status) == 0
    sharded = PCGSchurComplementSolver(mesh=mesh, block_size=8)
    p_fact = sharded.numeric(kkt)
    p_sol, p_status = sharded.solve_with_status(p_fact, rhs)
    assert int(p_status) == 0
    assert p_sol.blocks.shape == (7, 8)
    assert np.allclose(
        np.asarray(s_sol.blocks), np.asarray(p_sol.blocks), atol=1e-8
    )
    assert np.allclose(
        np.asarray(s_sol.coupling), np.asarray(p_sol.coupling), atol=1e-8
    )


def test_pad_block_count_helper():
    kkt = make_local_system(N=5)
    padded = pad_block_count(kkt, 4)
    assert padded.diag.shape[0] == 8
    assert np.array_equal(np.asarray(padded.mask), [1, 1, 1, 1, 1, 0, 0, 0])
    # dump index for padded rows
    assert np.all(np.asarray(padded.row_idx[5:]) == kkt.q.shape[0])
    # already divisible: unchanged object
    assert pad_block_count(kkt, 5) is kkt


# -- checkpoint validation ---------------------------------------------------


def test_checkpoint_rejects_mismatched_state(tmp_path):
    from parapint_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    path = str(tmp_path / "ck.npz")
    state = {"x": jnp.zeros(3), "y": jnp.ones((2, 2))}
    save_checkpoint(path, state, 0.1, 1e-8, 4)

    # same structure loads fine
    out, barrier, coef, it = load_checkpoint(path, like=state)
    assert it == 4 and barrier == 0.1
    assert np.array_equal(np.asarray(out["y"]), np.ones((2, 2)))

    # different shapes -> clear error
    with pytest.raises(ValueError, match="different problem size"):
        load_checkpoint(path, like={"x": jnp.zeros(5), "y": jnp.ones((2, 2))})

    # different structure -> clear error
    with pytest.raises(ValueError, match="different state structure"):
        load_checkpoint(path, like={"a": jnp.zeros(3), "b": jnp.ones((2, 2))})


def test_kkt_dtype_f32_solves_and_matches_f64():
    """Mixed-precision interface: kkt_dtype=f32 assembles the KKT matrix
    (and runs the Hessian sweep) in f32 while the rhs/convergence path stays
    f64.  The solve must still reach optimal at tol 1e-8 and agree with the
    full-f64 interface's solution."""
    from parapint_tpu.examples import burgers

    def solve(kkt_dtype):
        spec = burgers.build_spec(nfe_x=10, nfe_t=16, num_time_blocks=4)
        iface = pt.DynamicSchurComplementInteriorPointInterface(
            spec, kkt_dtype=kkt_dtype
        )
        opts = pt.IPOptions()
        opts.tol = 1e-8
        opts.linalg.solver = pt.SchurComplementSolver(
            block_size=32,
            explicit_inverse=True,
            factor_dtype=jnp.float32,
            refine_steps=0,
        )
        status = pt.ip_solve(iface, opts)
        assert status == pt.InteriorPointStatus.optimal, status
        return np.asarray(iface.get_primals()["blocks"])

    x32 = solve(jnp.float32)
    x64 = solve(None)
    err = np.linalg.norm(x32 - x64) / max(1.0, np.linalg.norm(x64))
    assert err < 1e-6, err


def test_kkt_dtype_f32_assembles_f32_matrix_f64_rhs():
    from parapint_tpu.examples import burgers

    spec = burgers.build_spec(nfe_x=8, nfe_t=8, num_time_blocks=2)
    iface = pt.DynamicSchurComplementInteriorPointInterface(
        spec, kkt_dtype=jnp.float32
    )
    state = iface.init_state()
    iface._current_state = state
    data = iface.eval_kkt_data(state, 0.1)
    kkt = iface.assemble_kkt(data, 1e-8, 1e-8)
    rhs = iface.kkt_rhs(data)
    assert kkt.diag.dtype == jnp.float32
    assert kkt.q.dtype == jnp.float32
    assert rhs.blocks.dtype == jnp.float64
    assert rhs.coupling.dtype == jnp.float64


def test_kkt_dtype_with_higher_precision_factor_warns():
    """kkt_dtype=f32 + factor_dtype=f64 defeats the hybrid pivot-sign
    guarantee (the matrix is rounded before the f64 sweep) — must warn."""
    import warnings

    from parapint_tpu.examples import burgers

    spec = burgers.build_spec(nfe_x=8, nfe_t=8, num_time_blocks=2)
    iface = pt.DynamicSchurComplementInteriorPointInterface(
        spec, kkt_dtype=jnp.float32
    )
    opts = pt.IPOptions()
    opts.linalg.solver = pt.SchurComplementSolver(
        block_size=32, factor_dtype=jnp.float64
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pt.make_fused_ip_solve(iface, opts)
    assert any("reduced precision" in str(x.message) for x in w)

    # the production combination (f32 matrix, f32 factor) stays silent
    opts2 = pt.IPOptions()
    opts2.linalg.solver = pt.SchurComplementSolver(
        block_size=32, factor_dtype=jnp.float32
    )
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        pt.make_fused_ip_solve(iface, opts2)
    assert not any("reduced precision" in str(x.message) for x in w2)


@pytest.mark.slow
def test_sharded_chain_kkt_nondivisible_blocks_matches_serial():
    """Regression: auto-padding a CHAIN KKT must not corrupt the solution.

    The chain fast path's shifted placement windows are sized for exactly
    ng coupling groups; padded blocks beyond the last real group overflowed
    them, and XLA's dynamic-slice clamping silently shifted REAL blocks'
    contributions onto wrong groups (observed 9e-2 solution error with
    status=successful at N=5 on 2 shards).  pad_block_count now falls back
    to the padding-safe scatter assembly."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from jax.sharding import Mesh
    from test_sc_assembly import chain_row_idx

    rng = np.random.default_rng(11)
    N, ns, nk = 5, 2, 8
    ncv = (N - 1) * ns
    diag = rng.standard_normal((N, nk, nk))
    diag = diag + np.swapaxes(diag, 1, 2) + 6 * nk * np.eye(nk)
    border_loc = rng.normal(size=(N, 2 * ns, nk))
    border_loc[0, :ns] = 0.0
    border_loc[N - 1, ns:] = 0.0
    row_idx = chain_row_idx(N, ns)
    q = np.eye(ncv) * 3.0
    kkt = LocalBlockKKT.make(
        diag=jnp.asarray(diag),
        border_loc=jnp.asarray(border_loc),
        row_idx=jnp.asarray(row_idx),
        q=jnp.asarray(q),
        assembly="chain",
    )
    rhs = BlockRhs(
        blocks=jnp.asarray(rng.standard_normal((N, nk))),
        coupling=jnp.asarray(rng.standard_normal(ncv)),
    )

    serial = SchurComplementSolver(block_size=8)
    sfact = serial.numeric(kkt)
    ssol = serial.solve(sfact, rhs)

    mesh = Mesh(np.array(jax.devices()[:2]), ("blocks",))
    sharded = ShardedSchurComplementSolver(mesh=mesh, block_size=8)
    assert sharded.symbolic(kkt).status == LinearSolverStatus.successful
    fact = sharded.numeric(kkt)
    assert int(sharded.status(fact)) == int(LinearSolverStatus.successful)
    sol = sharded.solve(fact, rhs)
    err = max(
        float(jnp.max(jnp.abs(sol.blocks - ssol.blocks))),
        float(jnp.max(jnp.abs(sol.coupling - ssol.coupling))),
    )
    assert err < 1e-8, err


def test_adaptive_probe_ill_scaled_kkt_not_flagged():
    """Regression: the adaptive-refinement probe must not report failure
    for residuals below its own f32 measurement floor.

    On a well-conditioned but ill-scaled KKT (entries spanning ~1e10, as
    interior-point barrier terms produce) with O(1) rhs, the f32 probe's
    noise is ~eps_f32*|K||x| >> trigger*||rhs||: the raw rhs-relative test
    could never pass, so a converged solve (true f64 residual ~1e-11)
    burned all refinement passes and returned status=error."""
    rng = np.random.default_rng(5)
    N, nk, nc = 3, 16, 4
    scale = 10.0 ** rng.uniform(-5, 5, size=nk)
    diag = []
    for i in range(N):
        A = rng.standard_normal((nk, nk))
        A = A + A.T + 8 * nk * np.eye(nk)
        diag.append(scale[:, None] * A * scale[None, :])
    border = rng.standard_normal((N, nc, nk)) * scale[None, None, :]
    q = np.eye(nc) * 5.0
    kkt = BlockKKT.make(
        jnp.asarray(np.stack(diag)), jnp.asarray(border), jnp.asarray(q)
    )
    rhs = BlockRhs(
        blocks=jnp.asarray(rng.standard_normal((N, nk))),
        coupling=jnp.asarray(rng.standard_normal(nc)),
    )
    # adaptive refinement is the DEFAULT (refine_steps=None)
    solver = SchurComplementSolver(block_size=16)
    fact = solver.numeric(kkt)
    x, status = solver.solve_with_status(fact, rhs)
    assert int(status) == int(LinearSolverStatus.successful), int(status)
    # and the solution really is good (f64 check)
    from parapint_tpu.linalg.schur import _kkt_matvec

    kx = _kkt_matvec(fact, x)
    rel = float(
        np.linalg.norm(
            np.concatenate(
                [
                    np.asarray(rhs.blocks - kx.blocks).ravel(),
                    np.asarray(rhs.coupling - kx.coupling),
                ]
            )
        )
        / np.linalg.norm(
            np.concatenate(
                [np.asarray(rhs.blocks).ravel(), np.asarray(rhs.coupling)]
            )
        )
    )
    assert rel < 1e-6, rel


@pytest.mark.slow
def test_adaptive_refinement_stall_reports_error_serial_and_sharded():
    """A cond~1e14 system whose f32-factor refinement diverges must NOT
    report successful (NaN/overflowed residuals read as converged before:
    NaN > thresh is False, and f32 norm-squares of ~1e20 garbage iterates
    overflow to inf).  Both the serial and the sharded solver must surface
    the stall through solve_with_status."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    N, nk, nc = 4, 16, 3
    blocks = []
    for _ in range(N):
        Q, _ = np.linalg.qr(rng.standard_normal((nk, nk)))
        blocks.append(Q @ np.diag(np.logspace(0, -14, nk)) @ Q.T)
    border = rng.standard_normal((N, nc, nk)) * 1e-9
    kkt = BlockKKT.make(
        jnp.asarray(np.stack(blocks)), jnp.asarray(border), jnp.asarray(np.eye(nc))
    )
    rhs = BlockRhs(
        blocks=jnp.asarray(rng.standard_normal((N, nk))),
        coupling=jnp.asarray(rng.standard_normal(nc)),
    )
    ser = SchurComplementSolver(
        block_size=16, explicit_inverse=True, factor_dtype=jnp.float32
    )
    _, st = ser.solve_with_status(ser.numeric(kkt), rhs)
    assert int(st) != int(LinearSolverStatus.successful)

    mesh = Mesh(np.array(jax.devices()[:4]), ("blocks",))
    sh = ShardedSchurComplementSolver(
        mesh=mesh, block_size=16, explicit_inverse=True, factor_dtype=jnp.float32
    )
    _, st2 = sh.solve_with_status(sh.numeric(kkt), rhs)
    assert int(st2) != int(LinearSolverStatus.successful)
