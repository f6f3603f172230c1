"""Banded ops + condensed structured solver vs dense oracles.

Mirrors the reference's kernel-vs-dense-oracle test tier
(/root/reference/parapint/linalg/tests/test_linear_solvers.py) for the
large-block structured path (the MA27-on-sparse-blocks role,
examples/performance/schur_complement/create_model.py:23-47)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parapint_tpu.linalg import CondensedLSQKKT, CondensedLSQSolver
from parapint_tpu.linalg.schur import BlockRhs
from parapint_tpu.linalg.tridiag import BlockTridiag
from parapint_tpu.ops import banded as B


def _random_banded(n, p, rng):
    """(dense, row-indexed band store) pair."""
    M = np.zeros((n, n))
    bands = np.zeros((2 * p + 1, n))
    for d in range(-p, p + 1):
        for i in range(n):
            j = i + d
            if 0 <= j < n:
                v = rng.standard_normal()
                M[i, j] = v
                bands[d + p, i] = v
    return M, bands


class TestBandedOps:
    def test_matvec_rmatvec(self):
        rng = np.random.default_rng(0)
        M, bands = _random_banded(37, 2, rng)
        x = rng.standard_normal(37)
        X = rng.standard_normal((37, 3))
        np.testing.assert_allclose(
            B.banded_matvec(jnp.asarray(bands), jnp.asarray(x)), M @ x, atol=1e-12
        )
        np.testing.assert_allclose(
            B.banded_rmatvec(jnp.asarray(bands), jnp.asarray(X)), M.T @ X, atol=1e-12
        )

    def test_btb(self):
        rng = np.random.default_rng(1)
        M, bands = _random_banded(29, 1, rng)
        G = M.T @ M
        btb = np.asarray(B.banded_btb(jnp.asarray(bands)))
        for e in range(btb.shape[0]):
            for i in range(29 - e):
                assert abs(btb[e, i] - G[i + e, i]) < 1e-12

    def test_band_to_tridiag_tiles(self):
        rng = np.random.default_rng(2)
        M, _ = _random_banded(37, 1, rng)
        G = M.T @ M  # SPD-ish, bandwidth 2
        n = 37
        Gb = np.zeros((3, n))
        for e in range(3):
            Gb[e, : n - e] = np.diagonal(G, -e)
        ts = 8
        Gp, n_pad = B.pad_sym_band(jnp.asarray(Gb), ts)
        dt, ut = B.sym_band_to_tridiag_tiles(Gp, ts)
        D = np.asarray(BlockTridiag(diag=dt, upper=ut).todense())
        Gfull = np.eye(n + n_pad)
        Gfull[:n, :n] = G
        np.testing.assert_allclose(D, Gfull, atol=1e-12)

    def test_bandwidth_exceeds_tile(self):
        with pytest.raises(ValueError):
            B.sym_band_to_tridiag_tiles(jnp.zeros((10, 16)), 8)


def _build_harness_system(nq, nm, nt, N, p, rng):
    """Dense oracle of the condensed system in [y, nu, q, lam] layout."""
    ny = nm * nq
    A_bands = np.zeros((nm, 2 * p + 1, nq))
    A = np.zeros((ny, nq))
    for j in range(nm):
        Mj, bj = _random_banded(nq, p, rng)
        A[j * nq : (j + 1) * nq] = Mj
        A_bands[j] = bj
    nk = 2 * ny + nq + nt
    off_nu, off_q, off_lam = ny, 2 * ny, 2 * ny + nq
    K = np.zeros((nk, nk))
    K[:ny, :ny] = 2 * np.eye(ny)
    K[:ny, off_nu : off_nu + ny] = np.eye(ny)
    K[off_nu : off_nu + ny, :ny] = np.eye(ny)
    K[off_q : off_q + nq, off_nu : off_nu + ny] = -A.T
    K[off_nu : off_nu + ny, off_q : off_q + nq] = -A
    P = np.zeros((nt, nq))
    P[:, :nt] = np.eye(nt)
    K[off_q : off_q + nq, off_lam:] = P.T
    K[off_lam:, off_q : off_q + nq] = P
    dim = N * nk + nt
    M = np.zeros((dim, dim))
    for b in range(N):
        M[b * nk : (b + 1) * nk, b * nk : (b + 1) * nk] = K
        for j in range(nt):
            M[N * nk + j, b * nk + off_lam + j] = -1.0
            M[b * nk + off_lam + j, N * nk + j] = -1.0
    return A_bands, M, nk, off_lam


class TestCondensedSolver:
    def test_solve_and_inertia_vs_dense(self):
        rng = np.random.default_rng(3)
        nq, nm, nt, N, p = 30, 3, 4, 5, 1
        A_bands, M, nk, _ = _build_harness_system(nq, nm, nt, N, p, rng)
        rhs = rng.standard_normal(M.shape[0])
        expected = np.linalg.solve(M, rhs)

        kkt = CondensedLSQKKT(
            A_bands=jnp.asarray(A_bands),
            q_c=jnp.zeros((nt, nt)),
            n_t=nt,
            n_blocks=N,
        )
        solver = CondensedLSQSolver(tile_size=8)
        solver.symbolic(kkt)
        fact = jax.jit(solver.numeric)(kkt)
        brhs = BlockRhs(
            blocks=jnp.asarray(rhs[: N * nk].reshape(N, nk)),
            coupling=jnp.asarray(rhs[N * nk :]),
        )
        sol = solver.solve(fact, brhs, kkt=kkt)
        np.testing.assert_allclose(
            np.asarray(sol.blocks).ravel(), expected[: N * nk], atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(sol.coupling), expected[N * nk :], atol=1e-8
        )
        w = np.linalg.eigvalsh(M)
        pos, neg, zero = (int(v) for v in solver.inertia(fact))
        assert (pos, neg, zero) == ((w > 0).sum(), (w < 0).sum(), 0)
        assert int(solver.status(fact)) == 0

    def test_nonpadding_tile_size(self):
        # n_q not a multiple of the tile size exercises pad_sym_band
        rng = np.random.default_rng(4)
        nq, nm, nt, N, p = 27, 2, 3, 2, 1
        A_bands, M, nk, _ = _build_harness_system(nq, nm, nt, N, p, rng)
        rhs = rng.standard_normal(M.shape[0])
        expected = np.linalg.solve(M, rhs)
        kkt = CondensedLSQKKT(
            A_bands=jnp.asarray(A_bands),
            q_c=jnp.zeros((nt, nt)),
            n_t=nt,
            n_blocks=N,
        )
        solver = CondensedLSQSolver(tile_size=8)
        fact = jax.jit(solver.numeric)(kkt)
        brhs = BlockRhs(
            blocks=jnp.asarray(rhs[: N * nk].reshape(N, nk)),
            coupling=jnp.asarray(rhs[N * nk :]),
        )
        sol = solver.solve(fact, brhs, kkt=kkt)
        np.testing.assert_allclose(
            np.asarray(sol.blocks).ravel(), expected[: N * nk], atol=1e-8
        )
        w = np.linalg.eigvalsh(M)
        pos, neg, zero = (int(v) for v in solver.inertia(fact))
        assert (pos, neg, zero) == ((w > 0).sum(), (w < 0).sum(), 0)


class TestPerfHarnessCsc:
    def test_csc_matches_ssc_and_succeeds(self):
        from parapint_tpu.examples.performance import schur_complement as perf

        r_ssc = perf.run(
            method="ssc", n_blocks=3, n_q_per_block=32, n_y_multiplier=2,
            verbose=False,
        )
        r_csc = perf.run(
            method="csc", n_blocks=3, n_q_per_block=32, n_y_multiplier=2,
            verbose=False,
        )
        assert r_ssc.status == 0
        assert r_csc.status == 0
        assert np.isclose(r_ssc.max_err, r_csc.max_err, rtol=1e-6, atol=1e-9)

    def test_csc_sharded_matches_serial(self):
        """csc with mesh= shards the back solve's block axis (the reference
        psc's parallel axis at its default scale, main.py:84-102): the
        sharded solution must match the serial one to roundoff and recover
        the planted theta, including at a NON-divisible block count (zero-rhs
        padding)."""
        import jax
        from jax.sharding import Mesh
        from parapint_tpu.examples.performance import schur_complement as perf

        if len(jax.devices()) < 8:
            import pytest

            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.array(jax.devices()[:8]), ("blocks",))
        for n_blocks in (8, 11):
            r_ser = perf.run(
                method="csc", n_blocks=n_blocks, n_q_per_block=32,
                n_y_multiplier=2, verbose=False,
            )
            r_par = perf.run(
                method="csc", n_blocks=n_blocks, n_q_per_block=32,
                n_y_multiplier=2, mesh=mesh, verbose=False,
            )
            assert r_par.status == 0
            assert r_par.max_err < 1.0, r_par.max_err
            assert np.isclose(
                r_ser.max_err, r_par.max_err, rtol=1e-10, atol=1e-12
            ), (n_blocks, r_ser.max_err, r_par.max_err)

    def test_csc_sharded_default_scale_shapes(self):
        """Planted-theta recovery with the sharded solve at a large block
        size (scaled-down q-dimension of the reference default family) on
        the virtual 8-device mesh."""
        import jax
        from jax.sharding import Mesh
        from parapint_tpu.examples.performance import schur_complement as perf

        if len(jax.devices()) < 8:
            import pytest

            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.array(jax.devices()[:8]), ("blocks",))
        r = perf.run(
            method="csc", n_blocks=8, n_q_per_block=1000, n_y_multiplier=6,
            mesh=mesh, verbose=False, warm=True,
        )
        assert r.status == 0
        assert r.max_err < 1.0, r.max_err

    def test_csc_large_block(self):
        """A block size far beyond the dense methods' reach (the point of
        the structured path; reference defaults are n_q=5000, mult=120)."""
        from parapint_tpu.examples.performance import schur_complement as perf

        r = perf.run(
            method="csc", n_blocks=2, n_q_per_block=2000, n_y_multiplier=10,
            verbose=False,
        )
        assert r.status == 0
        # planted theta recovered through 0.01-sigma noise
        assert r.max_err < 1.0, r.max_err
