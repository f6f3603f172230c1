"""Schur-complement solver vs dense oracle.

Mirrors the reference's SC tests: build a small block-bordered system, solve
with the SC solver, compare against a monolithic dense solve, and compare
the inertia against dense eigenvalues
(/root/reference/parapint/linalg/schur_complement/tests/test_explicit_schur_complement.py:13-55).
The sharded variant is checked for exact agreement with the serial solver on
the 8-device CPU mesh (the reference's MPI-vs-serial twin test,
test_mpi_explicit_schur_complement.py:22-115).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parapint_tpu.linalg import (
    BlockKKT,
    DenseLDLSolver,
    LinearSolverStatus,
    SchurComplementSolver,
    ShardedSchurComplementSolver,
)
from parapint_tpu.linalg.schur import BlockRhs


def make_system(N=4, nk=12, nc=5, seed=0):
    rng = np.random.default_rng(seed)
    diag = np.zeros((N, nk, nk))
    border = np.zeros((N, nc, nk))
    for i in range(N):
        A = rng.standard_normal((nk, nk))
        diag[i] = A @ A.T + nk * np.eye(nk)  # SPD blocks for a clean oracle
        border[i] = rng.standard_normal((nc, nk)) * (rng.random((nc, nk)) < 0.4)
    q = rng.standard_normal((nc, nc))
    q = q @ q.T + nc * np.eye(nc)
    return diag, border, q


def dense_assemble(diag, border, q):
    N, nk, _ = diag.shape
    nc = q.shape[0]
    n = N * nk + nc
    M = np.zeros((n, n))
    for i in range(N):
        M[i * nk : (i + 1) * nk, i * nk : (i + 1) * nk] = diag[i]
        M[N * nk :, i * nk : (i + 1) * nk] = border[i]
        M[i * nk : (i + 1) * nk, N * nk :] = border[i].T
    M[N * nk :, N * nk :] = q
    return M


def run_solver(solver, diag, border, q, rhs_blocks, rhs_coupling):
    kkt = BlockKKT.make(jnp.asarray(diag), jnp.asarray(border), jnp.asarray(q))
    res = solver.symbolic(kkt)
    assert res.status == LinearSolverStatus.successful
    fact = solver.numeric(kkt)
    assert (
        LinearSolverStatus(int(solver.status(fact))) == LinearSolverStatus.successful
    )
    sol = solver.solve(
        fact, BlockRhs(blocks=jnp.asarray(rhs_blocks), coupling=jnp.asarray(rhs_coupling))
    )
    return fact, np.asarray(sol.blocks), np.asarray(sol.coupling)


@pytest.mark.parametrize("N,nk,nc", [(4, 12, 5), (3, 30, 1), (8, 16, 16)])
def test_serial_schur_vs_dense(N, nk, nc):
    diag, border, q = make_system(N, nk, nc)
    M = dense_assemble(diag, border, q)
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(M.shape[0])
    rhs = M @ x_true
    rhs_blocks = rhs[: N * nk].reshape(N, nk)
    rhs_coupling = rhs[N * nk :]

    solver = SchurComplementSolver(block_size=16)
    fact, xb, xc = run_solver(solver, diag, border, q, rhs_blocks, rhs_coupling)

    assert np.allclose(xb.reshape(-1), x_true[: N * nk], rtol=1e-8, atol=1e-8)
    assert np.allclose(xc, x_true[N * nk :], rtol=1e-8, atol=1e-8)

    pos, neg, zero = solver.inertia(fact)
    w = np.linalg.eigvalsh(M)
    # note: block inertia + SC inertia equals the global inertia (Haynsworth)
    assert int(pos) == (w > 0).sum()
    assert int(neg) == (w < 0).sum()
    assert int(zero) == 0


def test_indefinite_blocks():
    # saddle-point diagonal blocks (the real IP case)
    rng = np.random.default_rng(5)
    N, n, m, nc = 3, 8, 4, 3
    nk = n + m
    diag = np.zeros((N, nk, nk))
    border = np.zeros((N, nc, nk))
    for i in range(N):
        H = rng.standard_normal((n, n))
        H = H @ H.T + n * np.eye(n)
        J = rng.standard_normal((m, n))
        diag[i] = np.block([[H, J.T], [J, -1e-8 * np.eye(m)]])
        border[i, :, :n] = rng.standard_normal((nc, n))
    q = np.diag(rng.random(nc) + 1.0)
    M = dense_assemble(diag, border, q)
    x_true = rng.standard_normal(M.shape[0])
    rhs = M @ x_true

    solver = SchurComplementSolver(block_size=8)
    fact, xb, xc = run_solver(
        solver, diag, border, q, rhs[: N * nk].reshape(N, nk), rhs[N * nk :]
    )
    assert np.allclose(
        np.concatenate([xb.reshape(-1), xc]), x_true, rtol=1e-7, atol=1e-7
    )
    pos, neg, zero = solver.inertia(fact)
    w = np.linalg.eigvalsh(M)
    assert (int(pos), int(neg), int(zero)) == ((w > 0).sum(), (w < 0).sum(), 0)


def test_masked_padding_blocks():
    # padding blocks (mask=0) must not affect solution or inertia
    diag, border, q = make_system(4, 12, 5)
    M = dense_assemble(diag, border, q)
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(M.shape[0])
    rhs = M @ x_true

    # append 2 identity padding blocks
    pad_diag = np.concatenate([diag, np.tile(np.eye(12)[None], (2, 1, 1))])
    pad_border = np.concatenate([border, np.zeros((2, 5, 12))])
    mask = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    kkt = BlockKKT.make(
        jnp.asarray(pad_diag), jnp.asarray(pad_border), jnp.asarray(q), mask
    )
    solver = SchurComplementSolver(block_size=16)
    fact = solver.numeric(kkt)
    rhs_blocks = np.concatenate([rhs[:48].reshape(4, 12), np.zeros((2, 12))])
    sol = solver.solve(
        fact, BlockRhs(blocks=jnp.asarray(rhs_blocks), coupling=jnp.asarray(rhs[48:]))
    )
    assert np.allclose(np.asarray(sol.blocks)[:4].reshape(-1), x_true[:48])
    assert np.allclose(np.asarray(sol.coupling), x_true[48:])
    pos, neg, zero = solver.inertia(fact)
    w = np.linalg.eigvalsh(M)
    assert (int(pos), int(neg), int(zero)) == ((w > 0).sum(), (w < 0).sum(), 0)


@pytest.mark.parametrize("N,nk,nc", [(8, 12, 5), (16, 8, 3)])
def test_sharded_schur_matches_serial(N, nk, nc):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    diag, border, q = make_system(N, nk, nc, seed=9)
    M = dense_assemble(diag, border, q)
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(M.shape[0])
    rhs = M @ x_true
    rhs_blocks = rhs[: N * nk].reshape(N, nk)
    rhs_coupling = rhs[N * nk :]

    serial = SchurComplementSolver(block_size=8)
    _, xb_s, xc_s = run_solver(serial, diag, border, q, rhs_blocks, rhs_coupling)

    mesh = Mesh(np.array(jax.devices()[:8]), ("blocks",))
    sharded = ShardedSchurComplementSolver(mesh, "blocks", block_size=8)
    fact, xb_p, xc_p = run_solver(sharded, diag, border, q, rhs_blocks, rhs_coupling)

    assert np.allclose(xb_p, xb_s, rtol=1e-12, atol=1e-12)
    assert np.allclose(xc_p, xc_s, rtol=1e-12, atol=1e-12)

    pos, neg, zero = sharded.inertia(fact)
    w = np.linalg.eigvalsh(M)
    assert (int(pos), int(neg), int(zero)) == ((w > 0).sum(), (w < 0).sum(), 0)


def test_sharded_ld_mode_adaptive_refinement():
    """Sharded LD mode (explicit_inverse=False) with an f32 factor and the
    DEFAULT adaptive refinement must refine back to f64 solution accuracy —
    round 3 removed the old refine_steps=0 forcing in LD mode, and this
    fast-tier test pins the parity with the serial solver's behavior."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    diag, border, q = make_system(8, 12, 5, seed=11)
    M = dense_assemble(diag, border, q)
    rng = np.random.default_rng(7)
    x_true = rng.standard_normal(M.shape[0])
    rhs = M @ x_true
    mesh = Mesh(np.array(jax.devices()[:8]), ("blocks",))
    solver = ShardedSchurComplementSolver(
        mesh, "blocks", block_size=8, explicit_inverse=False,
        factor_dtype=jnp.float32,
    )
    assert solver.adaptive_refine
    fact, xb, xc = run_solver(
        solver, diag, border, q, rhs[: 8 * 12].reshape(8, 12), rhs[8 * 12 :]
    )
    # adaptive refinement keeps diag/q for the residual matvec in LD mode
    assert fact.diag is not None and fact.q is not None
    assert fact.block_LD is not None and fact.block_W is None
    # f32 factor alone is ~1e-5-accurate here; refinement restores ~1e-9
    err = np.max(
        np.abs(np.concatenate([xb.reshape(-1), xc]) - x_true)
    ) / np.max(np.abs(x_true))
    assert err < 1e-8, err


def test_hybrid_precision_factor():
    """factor_dtype=f64 + apply_dtype=f32: pivots/inertia keep f64 fidelity
    while W/d/s (every downstream apply) are f32; adaptive refinement
    restores f64 solution accuracy.  This is the production path for blocks
    whose elimination is too cancellation-heavy for an all-f32 sweep (e.g.
    single-time-step chain blocks)."""
    import jax.numpy as jnp

    diag, border, q = make_system(4, 12, 5, seed=4)
    # make the system indefinite so the inertia is nontrivial
    for i in range(4):
        diag[i][6:, 6:] *= -1.0
        diag[i] = 0.5 * (diag[i] + diag[i].T)
    M = dense_assemble(diag, border, q)
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(M.shape[0])
    rhs = M @ x_true
    rhs_blocks = rhs[:48].reshape(4, 12)
    rhs_coupling = rhs[48:]

    solver = SchurComplementSolver(
        block_size=8, explicit_inverse=True,
        factor_dtype=jnp.float64, apply_dtype=jnp.float32,
    )
    fact, xb, xc = run_solver(solver, diag, border, q, rhs_blocks, rhs_coupling)
    assert fact.block_W.dtype == jnp.float32
    assert fact.block_d.dtype == jnp.float32
    pos, neg, zero = solver.inertia(fact)
    w = np.linalg.eigvalsh(M)
    assert (int(pos), int(neg), int(zero)) == ((w > 0).sum(), (w < 0).sum(), 0)
    assert np.allclose(xb.reshape(-1), x_true[:48], atol=1e-7)
    assert np.allclose(xc, x_true[48:], atol=1e-7)


def test_w_store_dtype_bf16_refines_to_f64():
    """w_store_dtype=bf16 halves the HBM-bound W reads of every solve; the
    O(2^-8) storage rounding must be absorbed by the adaptive refinement:
    solution accuracy unchanged, W stored in bf16, SC still formed from the
    full-precision W (inertia exact)."""
    diag, border, q = make_system(4, 24, 5, seed=13)
    M = dense_assemble(diag, border, q)
    rng = np.random.default_rng(5)
    x_true = rng.standard_normal(M.shape[0])
    rhs = M @ x_true
    # bf16 applies contract the error ~1e-3/pass.  The ADAPTIVE probe is
    # f32 and by design cannot certify below ~32*eps_f32*|K||x| (~1e-6
    # here); FIXED refine_steps forces passes past the probe floor, and 3
    # passes reach f64-level step accuracy (1e-3^3 contraction).
    solver = SchurComplementSolver(
        block_size=8, explicit_inverse=True, factor_dtype=jnp.float32,
        w_store_dtype=jnp.bfloat16, refine_steps=3,
    )
    fact, xb, xc = run_solver(
        solver, diag, border, q, rhs[: 4 * 24].reshape(4, 24), rhs[4 * 24 :]
    )
    assert fact.block_W.dtype == jnp.bfloat16
    pos, neg, zero = solver.inertia(fact)
    w = np.linalg.eigvalsh(M)
    assert (int(pos), int(neg), int(zero)) == ((w > 0).sum(), (w < 0).sum(), 0)
    err = np.max(
        np.abs(np.concatenate([xb.reshape(-1), xc]) - x_true)
    ) / np.max(np.abs(x_true))
    assert err < 1e-8, err


def test_singular_block_reports_singular():
    """An exactly singular diagonal block (zero pivot from a zero Hessian
    row) must surface as a singular factorization so the interior-point
    inertia-correction loop regularizes — never a silent wrong solve
    (reference contract: MA27 info flags, ma27_interface.py:197-203)."""
    diag = np.array(
        [
            [[0.0, 1.0], [1.0, -1.0]],
            [[2.0, 1.0], [1.0, -1.0]],
        ]
    )
    border = np.array([[[0.3, 0.1]], [[0.2, -0.4]]])
    q = np.array([[5.0]])
    kkt = BlockKKT.make(jnp.asarray(diag), jnp.asarray(border), jnp.asarray(q))
    for solver in (
        SchurComplementSolver(block_size=8),
        SchurComplementSolver(block_size=8, explicit_inverse=True),
    ):
        fact = solver.numeric(kkt)
        assert (
            LinearSolverStatus(int(solver.status(fact)))
            == LinearSolverStatus.singular
        )
