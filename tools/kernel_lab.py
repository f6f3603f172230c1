"""On-chip experiments for the panel factorization kernels (run manually).

Finds the chunk sizes / kernel structures that fit the TPU's scoped-VMEM
budget at the production panel shape (b=128) and measures them, so the
production defaults in ops/pallas_ldl.py are chip-validated, not guessed.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_winv_inplace(a_ref, out_ref, w_ref):
    """winv kernel with ref-resident working buffers (no SSA copies of A/W)."""
    b = a_ref.shape[-1]
    row_ids = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    col_ids = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
    eye = jnp.where(row_ids == col_ids, jnp.float32(1), jnp.float32(0))
    out_ref[...] = a_ref[...]
    w_ref[...] = jnp.broadcast_to(eye, a_ref.shape).astype(a_ref.dtype)
    for j in range(b):
        col = out_ref[:, :, j : j + 1]
        piv = col[:, j : j + 1, :]
        piv_safe = jnp.where(jnp.abs(piv) > 0, piv, jnp.ones_like(piv))
        below = row_ids > jnp.int32(j)
        l = jnp.where(below, col / piv_safe, jnp.zeros_like(col))
        colmask = jnp.where(below, col, jnp.zeros_like(col))
        out_ref[...] = out_ref[...] - l * jnp.swapaxes(colmask, 1, 2)
        out_ref[:, :, j : j + 1] = jnp.where(below, l, col)
        w_ref[...] = w_ref[...] - l * w_ref[:, j : j + 1, :]


def run_winv_inplace(A, chunk):
    B, b, _ = A.shape
    C = min(chunk, B)
    return pl.pallas_call(
        _kernel_winv_inplace,
        out_shape=(
            jax.ShapeDtypeStruct(A.shape, A.dtype),
            jax.ShapeDtypeStruct(A.shape, A.dtype),
        ),
        grid=(B // C,),
        in_specs=[pl.BlockSpec((C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )(A)


def main():
    import builtins
    import functools as ft

    builtins.print = ft.partial(print, flush=True)
    rng = np.random.default_rng(0)
    b = 128
    B = 64
    M = rng.standard_normal((B, b, b)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(b, dtype=np.float32))

    from parapint_tpu.ops import pallas_ldl
    from parapint_tpu.ops import ldl

    # reference result via XLA fallback
    F_ref = jax.vmap(ldl._ldl_unblocked)(A)
    L_ref = jnp.tril(F_ref, -1) + jnp.eye(b)[None]
    W_ref = ldl._unit_lower_inv_b(L_ref)

    def check(F, W):
        e1 = float(jnp.max(jnp.abs(jnp.tril(F) - jnp.tril(F_ref))))
        e2 = float(jnp.max(jnp.abs(W - W_ref)))
        return e1, e2

    def bench(fn, *args):
        out = jax.block_until_ready(fn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best, out

    # 1) current SSA winv kernel at shrinking chunks
    for chunk in (16, 8, 4, 2):
        try:
            f = functools.partial(pallas_ldl.ldl_panels_batched_winv, chunk=chunk)
            t, (F, W) = bench(jax.jit(f), A)
            e1, e2 = check(F, W)
            print(f"ssa_winv chunk={chunk}: {t*1e3:.3f} ms err=({e1:.2e},{e2:.2e})")
        except Exception as ex:
            print(f"ssa_winv chunk={chunk}: FAIL {str(ex)[:160]}")

    # 2) in-place ref variant
    for chunk in (32, 16, 8, 4):
        try:
            f = functools.partial(run_winv_inplace, chunk=chunk)
            t, (F, W) = bench(jax.jit(f), A)
            e1, e2 = check(F, W)
            print(f"inplace_winv chunk={chunk}: {t*1e3:.3f} ms err=({e1:.2e},{e2:.2e})")
        except Exception as ex:
            print(f"inplace_winv chunk={chunk}: FAIL {str(ex)[:160]}")

    # 3) factor-only kernel (current)
    for chunk in (32, 16, 8):
        try:
            f = functools.partial(pallas_ldl.ldl_panels_batched, chunk=chunk)
            t, F = bench(jax.jit(f), A)
            e1 = float(jnp.max(jnp.abs(jnp.tril(F) - jnp.tril(F_ref))))
            print(f"ssa_factor chunk={chunk}: {t*1e3:.3f} ms err={e1:.2e}")
        except Exception as ex:
            print(f"ssa_factor chunk={chunk}: FAIL {str(ex)[:160]}")

    # 4) factor-only + XLA winv-from-leaves for comparison (full pipeline cost)
    def factored_winv(A):
        LD, d, W = ldl.ldl_factor_winv_batched(A, block_size=128)
        return LD, W

    try:
        t, (F, W) = bench(jax.jit(factored_winv), A)
        e1, e2 = check(F, W)
        print(f"ldl_factor_winv_batched bs=128: {t*1e3:.3f} ms err=({e1:.2e},{e2:.2e})")
    except Exception as ex:
        print(f"ldl_factor_winv_batched: FAIL {str(ex)[:200]}")


if __name__ == "__main__":
    main()
