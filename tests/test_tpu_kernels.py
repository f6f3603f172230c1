"""Real-TPU kernel tests (the pytest face of tools/tpu_smoke.py).

Round-1 and round-2 both shipped chip-only regressions (a pivot-row bug,
then a scoped-VMEM OOM) that CPU interpret-mode tests cannot catch.  These
tests run the production Pallas configs on the REAL backend:

    PT_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -m tpu -q

They skip automatically everywhere else (the default suite pins
JAX_PLATFORMS=cpu in conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="needs the real TPU backend (set PT_TEST_TPU=1)",
    ),
]


def _spd(B, b, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, b, b)).astype(np.float32)
    return jnp.asarray(
        M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(b, dtype=np.float32)
    )


@pytest.mark.parametrize("b", [128, 64])
def test_panel_kernels_production_shapes(b):
    from parapint_tpu.ops import ldl, pallas_ldl

    A = _spd(64, b)
    F_ref = jax.vmap(ldl._ldl_unblocked)(A)
    F = pallas_ldl.ldl_panels_batched(A)
    np.testing.assert_allclose(
        np.tril(np.asarray(F)), np.tril(np.asarray(F_ref)), atol=1e-4 * b
    )
    F2, W = pallas_ldl.ldl_panels_batched_winv(A)
    L = np.tril(np.asarray(F2), -1) + np.eye(b, dtype=np.float32)
    resid = np.max(
        np.abs(np.einsum("nij,njk->nik", L, np.asarray(W)) - np.eye(b))
    )
    assert resid < 1e-3


@pytest.mark.parametrize("b", [128, 64, 56])
def test_slab_kernels_production_shapes(b):
    """Round-4 slab (two-level) kernels — the production default — on the
    real backend, including the snapped odd-tile shape b=56 (ns=49 chain
    SC tiles round up to the nearest multiple of 8)."""
    from parapint_tpu.ops import ldl, pallas_ldl

    A = _spd(64, b, seed=1)
    F_ref = jax.vmap(ldl._ldl_unblocked)(A)
    F = pallas_ldl.ldl_panels_slab(A)
    np.testing.assert_allclose(
        np.tril(np.asarray(F)), np.tril(np.asarray(F_ref)), atol=1e-4 * b
    )
    F2, W = pallas_ldl.ldl_panels_slab_winv(A)
    assert np.array_equal(np.tril(np.asarray(F2)), np.tril(np.asarray(F)))
    L = np.tril(np.asarray(F2), -1) + np.eye(b, dtype=np.float32)
    resid = np.max(
        np.abs(np.einsum("nij,njk->nik", L, np.asarray(W)) - np.eye(b))
    )
    assert resid < 1e-3


def test_fused_winv_apply_on_chip():
    """The fused W-apply kernel (one HBM pass over W) vs the XLA two-GEMV
    form at the production shape class."""
    from parapint_tpu.ops.ldl import ldl_factor_winv_batched, ruiz_scale
    from parapint_tpu.ops.winv_apply import winv_apply_fused

    rng = np.random.default_rng(3)
    N, nk = 8, 200
    M = rng.standard_normal((N, nk, nk)).astype(np.float32)
    A = jnp.asarray(M @ M.transpose(0, 2, 1) + nk * np.eye(nk, dtype=np.float32))
    s = jax.vmap(ruiz_scale)(A)
    As = A * s[:, :, None] * s[:, None, :]
    LD, d, W = ldl_factor_winv_batched(As, block_size=128)
    b_rhs = jnp.asarray(rng.standard_normal((N, nk)).astype(np.float32))
    x = np.asarray(winv_apply_fused(W, d, s, b_rhs))
    x_ref = np.stack(
        [
            np.linalg.solve(
                np.asarray(A[i], dtype=np.float64),
                np.asarray(b_rhs[i], dtype=np.float64),
            )
            for i in range(N)
        ]
    )
    err = np.max(np.abs(x - x_ref)) / np.max(np.abs(x_ref))
    assert err < 1e-4, err


def test_bench_solver_config_solves_on_chip():
    """The exact bench.py solver config at the production per-block KKT
    shape (nfe_x=50), reduced to 8 blocks."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    import parapint_tpu as pt

    interface = bench.build_problem(nfe_x=50, nfe_t=32, n_blocks=8)
    options = pt.IPOptions()
    options.tol = bench.TOL
    options.linalg.solver = bench._make_solver()
    solve = pt.make_fused_ip_solve(interface, options)
    interface.set_bounds_relaxation_factor(options.bounds_relaxation_factor)
    result = solve(interface.init_state())
    assert int(result.status) == pt.InteriorPointStatus.optimal.value, (
        int(result.status),
        int(result.iterations),
    )
