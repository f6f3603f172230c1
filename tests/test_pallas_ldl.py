"""Pallas panel-factorization kernel vs the XLA reference implementation.

Runs in interpreter mode on CPU (the TPU path compiles the same kernel);
on-TPU equality with the XLA loop is exercised implicitly by every solver
test when the suite runs on TPU hardware.
"""

import numpy as np
import jax.numpy as jnp

from parapint_tpu.ops.ldl import _ldl_unblocked
from parapint_tpu.ops.pallas_ldl import ldl_panels


def test_panel_kernel_matches_xla_loop():
    rng = np.random.default_rng(0)
    B, b = 3, 32
    A = rng.standard_normal((B, b, b))
    A = A + np.swapaxes(A, 1, 2) + 4 * b * np.eye(b)
    out = np.asarray(ldl_panels(jnp.asarray(A), interpret=True))
    for i in range(B):
        ref = np.asarray(_ldl_unblocked(jnp.asarray(A[i])))
        assert np.allclose(np.tril(out[i]), np.tril(ref), atol=1e-12)


def test_panel_kernel_indefinite():
    rng = np.random.default_rng(1)
    d = np.array([3.0, -2.0, 1.0, -5.0] * 8)
    A = np.diag(d) + 0.01 * np.eye(32)
    out = np.asarray(ldl_panels(jnp.asarray(A[None]), interpret=True))[0]
    assert np.allclose(np.diag(out), d + 0.01, atol=1e-12)


def test_batched_kernel_consistent_on_asymmetric_input():
    """Regression: the rank-1 update must read the pivot COLUMN.

    An earlier version read row j of the trailing block ("symmetric up to
    roundoff") instead; on inputs with ulp-level asymmetry (any Ruiz-scaled
    KKT block) the factor then drifts from the lower-triangle-consistent
    one, which under interior-point element growth cost ~2x IP iterations
    on the Burgers benchmark.  The batched kernel must agree with the
    single-panel kernel essentially bitwise — same column-read dataflow —
    even when fed a perturbed (non-symmetric) matrix.
    """
    from parapint_tpu.ops.pallas_ldl import ldl_panels_batched

    rng = np.random.default_rng(7)
    B, b = 4, 32
    A = rng.standard_normal((B, b, b))
    A = A + np.swapaxes(A, 1, 2) + 4 * b * np.eye(b)
    A = (A + 1e-7 * rng.standard_normal((B, b, b))).astype(np.float32)
    out_b = np.asarray(ldl_panels_batched(jnp.asarray(A), chunk=2, interpret=True))
    out_s = np.asarray(ldl_panels(jnp.asarray(A), interpret=True))
    np.testing.assert_allclose(
        np.tril(out_b), np.tril(out_s), rtol=1e-6, atol=1e-6
    )


def test_panel_winv_kernel_matches_xla(  # new fused factor+inverse kernel
):
    from parapint_tpu.ops.ldl import _ldl_unblocked, _unit_lower_inv_b
    from parapint_tpu.ops.pallas_ldl import ldl_panels_batched_winv
    import jax

    rng = np.random.default_rng(2)
    A = rng.standard_normal((5, 16, 16)).astype(np.float32)
    A = A + A.transpose(0, 2, 1) + 16 * np.eye(16, dtype=np.float32)
    out, W = ldl_panels_batched_winv(jnp.asarray(A), chunk=2, interpret=True)
    F_ref = jax.vmap(_ldl_unblocked)(jnp.asarray(A))
    L = np.tril(np.asarray(F_ref), -1) + np.eye(16)
    W_ref = np.linalg.inv(L)
    np.testing.assert_allclose(np.asarray(out), np.asarray(F_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(W), W_ref, rtol=2e-4, atol=2e-4)


def test_slab_kernels_match_unblocked():
    """Two-level (slab-blocked) kernels vs the XLA reference loop.

    The slab kernel replaces full-width rank-1 steps with slab-local steps
    plus rank-r MXU trailing updates (round-4 latency fix); its factor must
    match the unblocked column algorithm to f32 accumulation noise, its W
    must invert L, and LDL^T must reconstruct A.
    """
    import jax
    from parapint_tpu.ops.pallas_ldl import ldl_panels_slab, ldl_panels_slab_winv

    rng = np.random.default_rng(3)
    for B, b in [(3, 32), (2, 128), (2, 8)]:
        A = rng.standard_normal((B, b, b))
        A = (A + A.swapaxes(1, 2)) / 2 + b * np.eye(b)
        A[0, b // 2 :, b // 2 :] -= 2 * b * np.eye(b - b // 2)  # indefinite
        Af = jnp.asarray(A, dtype=jnp.float32)
        ref = np.tril(np.asarray(jax.vmap(_ldl_unblocked)(Af)))
        out = np.asarray(ldl_panels_slab(Af, interpret=True))
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(np.tril(out) - ref)) < 1e-5 * scale
        out2, W = ldl_panels_slab_winv(Af, interpret=True)
        assert np.array_equal(np.tril(np.asarray(out2)), np.tril(out))
        L = np.tril(np.asarray(out2), -1) + np.eye(b)
        assert np.max(np.abs(np.einsum("bij,bjk->bik", np.asarray(W), L) - np.eye(b))) < 1e-4
        d = np.asarray(jnp.diagonal(out2, axis1=1, axis2=2))
        rec = np.einsum("bij,bj,bkj->bik", L, d, L)
        assert np.max(np.abs(rec - A)) < 1e-5 * np.max(np.abs(A))


def test_slab_kernel_consistent_on_asymmetric_input():
    """The slab kernel must keep the pivot-COLUMN dataflow (see
    test_batched_kernel_consistent_on_asymmetric_input): on ulp-asymmetric
    input it must agree with the per-column batched kernel to accumulation
    noise, not drift to the mirror factorization."""
    from parapint_tpu.ops.pallas_ldl import ldl_panels_batched, ldl_panels_slab

    rng = np.random.default_rng(8)
    B, b = 4, 32
    A = rng.standard_normal((B, b, b))
    A = A + np.swapaxes(A, 1, 2) + 4 * b * np.eye(b)
    A = (A + 1e-7 * rng.standard_normal((B, b, b))).astype(np.float32)
    out_s = np.asarray(ldl_panels_slab(jnp.asarray(A), chunk=2, interpret=True))
    out_c = np.asarray(ldl_panels_batched(jnp.asarray(A), chunk=2, interpret=True))
    np.testing.assert_allclose(
        np.tril(out_s), np.tril(out_c), rtol=1e-5, atol=1e-5
    )


def test_slab_kernels_random_shapes_vs_unblocked():
    """Randomized shape sweep of the slab kernels (interpret mode):
    indefinite, ill-scaled, and padded-batch cases must all reconstruct
    L D L^T = A and agree with the unblocked column algorithm."""
    import jax
    from parapint_tpu.ops.pallas_ldl import ldl_panels_slab, ldl_panels_slab_winv

    rng = np.random.default_rng(42)
    for B, b, scale, chunk in [
        (1, 8, 1.0, None),
        (5, 16, 1e4, 2),
        (2, 40, 1e-3, None),
        (3, 56, 1.0, 2),
        (9, 24, 1.0, 4),  # B not a multiple of chunk
    ]:
        A = rng.standard_normal((B, b, b)) * scale
        A = (A + A.swapaxes(1, 2)) / 2
        # strong diagonal with mixed signs: unpivoted-stable, indefinite
        signs = np.where(rng.random((B, b)) < 0.3, -1.0, 1.0)
        A += np.einsum("bi,ij->bij", signs * (2 * b * scale), np.eye(b))
        Af = jnp.asarray(A, dtype=jnp.float32)
        ref = np.tril(
            np.asarray(jax.vmap(_ldl_unblocked)(Af)), 0
        )
        out = np.asarray(ldl_panels_slab(Af, chunk=chunk, interpret=True))
        scale_ref = np.max(np.abs(ref))
        assert (
            np.max(np.abs(np.tril(out) - ref)) < 3e-5 * scale_ref
        ), (B, b, scale)
        out2, W = ldl_panels_slab_winv(Af, chunk=chunk, interpret=True)
        L = np.tril(np.asarray(out2), -1) + np.eye(b)
        d = np.asarray(jnp.diagonal(out2, axis1=1, axis2=2))
        rec = np.einsum("bij,bj,bkj->bik", L, d, L)
        assert np.max(np.abs(rec - A)) < 3e-5 * np.max(np.abs(A)), (B, b)
        WL = np.einsum("bij,bjk->bik", np.asarray(W), L)
        assert np.max(np.abs(WL - np.eye(b))) < 2e-3, (B, b, scale)


def test_end_to_end_ip_solve_with_interpret_kernels(monkeypatch):
    """Full fused IP solve with the PALLAS kernels in interpret mode.

    The unit tests above check kernel outputs; this drives the production
    TPU kernel path (batched factor + fused factor+inverse) through a real
    interior-point solve, so kernel-numerics regressions that only show up
    in composition (e.g. the pivot-row/column asymmetry fix, which cost
    ~2x iterations while every unit check still passed tolerance) fail CI.
    """
    import functools

    import jax
    import parapint_tpu.ops.pallas_ldl as pl

    monkeypatch.setattr(pl, "available", lambda: True)
    for name in (
        "ldl_panels",
        "ldl_panels_batched",
        "ldl_panels_batched_winv",
        "ldl_panels_slab",
        "ldl_panels_slab_winv",
    ):
        fn = getattr(pl, name)
        monkeypatch.setattr(pl, name, functools.partial(fn, interpret=True))

    import parapint_tpu as pt
    from parapint_tpu.examples import burgers

    spec = burgers.build_spec(nfe_x=10, nfe_t=16, num_time_blocks=4)
    iface = pt.DynamicSchurComplementInteriorPointInterface(
        spec, kkt_dtype=jnp.float32
    )
    opts = pt.IPOptions()
    opts.tol = 1e-8
    opts.linalg.solver = pt.SchurComplementSolver(
        block_size=128,
        explicit_inverse=True,
        factor_dtype=jnp.float32,
        refine_steps=0,
        schur_complement_solver=pt.BlockTridiagSolver(),
    )
    solve = pt.make_fused_ip_solve(iface, opts)
    iface.set_bounds_relaxation_factor(opts.bounds_relaxation_factor)
    res = solve(iface.init_state())
    assert int(res.status) == pt.InteriorPointStatus.optimal.value
    # the kernel-asymmetry regression showed up as ~2x this count
    assert int(res.iterations) <= 9, int(res.iterations)
