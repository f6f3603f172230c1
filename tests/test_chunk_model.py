"""VMEM-budget / chunk-default models for the Pallas panel kernels.

These encode the chip-measured constraints (tools/kernel_lab*.py, round 3):
the winv kernel's scoped-VMEM stack is ~40 live (b,b) f32 panels per chunk
element (the compiler reported 42.32M at chunk=16, b=128 against a 16M
limit — the round-2 benchmark crash), and the measured throughput sweet
spot is C*b = 512.
"""

import jax.numpy as jnp
import numpy as np

from parapint_tpu.ops import ldl, pallas_ldl


def test_winv_max_chunk_matches_measured_budget():
    # b=128: chunk 4 fits, chunk 8 exceeded the scoped limit on chip
    assert pallas_ldl.winv_max_chunk(128) >= 4
    assert pallas_ldl.winv_max_chunk(128) < 8
    # monotone in b
    assert pallas_ldl.winv_max_chunk(64) >= pallas_ldl.winv_max_chunk(128)
    # huge panels: no chunk fits -> callers must fall back
    assert pallas_ldl.winv_max_chunk(1024) == 0


def test_panel_chunk_default_sweet_spot():
    assert pallas_ldl.panel_chunk_default(128) == 4
    assert pallas_ldl.panel_chunk_default(64) == 8
    assert pallas_ldl.panel_chunk_default(32) == 16  # capped
    assert pallas_ldl.panel_chunk_default(512) >= 1  # never zero


def test_winv_kernel_clamps_default_chunk_interpret():
    """Default call at b=128 must produce correct results (interpret mode
    exercises the exact clamped configuration the chip runs)."""
    rng = np.random.default_rng(0)
    b, B = 128, 8
    M = rng.standard_normal((B, b, b)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(b, dtype=np.float32))
    F, W = pallas_ldl.ldl_panels_batched_winv(A, interpret=True)
    F_ref = np.asarray(
        __import__("jax").vmap(ldl._ldl_unblocked)(A)
    )
    np.testing.assert_allclose(
        np.tril(np.asarray(F)), np.tril(F_ref), atol=1e-4
    )
    L = np.tril(np.asarray(F), -1) + np.eye(b, dtype=np.float32)
    resid = np.max(np.abs(np.einsum("nij,njk->nik", L, np.asarray(W)) - np.eye(b)))
    assert resid < 1e-3


def test_factor_falls_back_when_no_chunk_fits(monkeypatch):
    """If even chunk=1 exceeds the winv VMEM budget, the batched winv panel
    helper must use the XLA path instead of crashing at compile time.
    (The budget applies to the per-column kernel; the round-4 slab default
    has no chunk ceiling, so pin PT_PANEL_ALGO=column here.)"""
    calls = {"pallas": 0}
    monkeypatch.setenv("PT_PANEL_ALGO", "column")
    monkeypatch.setattr(
        pallas_ldl, "winv_max_chunk", lambda b: 0
    )
    monkeypatch.setattr(pallas_ldl, "available", lambda: True)

    def boom(*a, **k):
        calls["pallas"] += 1
        raise AssertionError("pallas path must not be taken")

    monkeypatch.setattr(pallas_ldl, "ldl_panels_batched_winv", boom)
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((2, 16, 16)).astype(np.float32))
    A = jnp.einsum("nij,nkj->nik", A, A) + 0.1 * jnp.eye(16, dtype=jnp.float32)
    F, W = ldl._panel_factor_batch_winv(A)
    assert calls["pallas"] == 0
    F_ref = np.asarray(__import__("jax").vmap(ldl._ldl_unblocked)(A))
    np.testing.assert_allclose(np.tril(np.asarray(F)), np.tril(F_ref), atol=1e-5)
