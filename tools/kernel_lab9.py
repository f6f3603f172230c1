"""fori_loop panel kernel in transposed space: C=64 in ONE grid step.

The unrolled SSA kernel caps at C=4 (live-range spill above) and is
latency-bound at (B/C)*b sequential steps.  A lax.fori_loop body keeps ONE
loop-carried buffer, so C can be the whole batch; the blocker was dynamic
LANE indexing (col j extraction).  In TRANSPOSED space every dynamic index
is on the sublane dim (row extraction), which Mosaic lowers; the pivot and
the W column are recovered with onehot lane-reductions.  Input panels are
symmetric (KKT blocks), so A^T = A: the kernel reads A directly and emits
the packed factor TRANSPOSED (upper = L^T, diagonal = D); the wrapper
transposes back.
"""

import builtins
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
builtins.print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed_loop(step, x0, reps=REPS):
    @jax.jit
    def run(x):
        return lax.fori_loop(0, reps, lambda i, x: step(x), x)

    _force(run(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def _kernel_fori_t(a_ref, out_ref):
    """Packed-UPPER factor of symmetric panels via fori_loop.

    T carries the transposed working matrix; row j of T is column j of A.
    """
    C, b, _ = a_ref.shape
    lane_ids = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)

    def body(j, carry):
        T, O = carry
        row = lax.dynamic_slice_in_dim(T, j, 1, axis=1)  # (C, 1, b)
        onehot = (lane_ids == j).astype(row.dtype)  # (1, 1, b)
        piv = jnp.sum(row * onehot, axis=2, keepdims=True)  # (C, 1, 1)
        piv_safe = jnp.where(jnp.abs(piv) > 0, piv, jnp.ones_like(piv))
        beyond = lane_ids > j  # (1, 1, b)
        l_row = jnp.where(beyond, row / piv_safe, jnp.zeros_like(row))
        out_row = jnp.where(beyond, l_row, row)
        O = lax.dynamic_update_slice_in_dim(O, out_row, j, axis=1)
        rowmask = jnp.where(beyond, row, jnp.zeros_like(row))  # (C,1,b)
        col = jnp.swapaxes(rowmask, 1, 2)  # (C, b, 1)
        T = T - col * l_row
        return T, O

    T0 = a_ref[...]
    _, O = lax.fori_loop(0, b, body, (T0, jnp.zeros_like(T0)))
    out_ref[...] = O


def run_fori_t(A, chunk):
    B, b, _ = A.shape
    C = min(chunk, B)
    with jax.enable_x64(False):
        out_t = pl.pallas_call(
            _kernel_fori_t,
            out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
            grid=(B // C,),
            in_specs=[
                pl.BlockSpec((C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        )(A)
    return jnp.swapaxes(out_t, 1, 2)


def main():
    from parapint_tpu.ops import ldl as L
    from parapint_tpu.ops import pallas_ldl as P

    rng = np.random.default_rng(0)
    b, B = 128, 64
    M = rng.standard_normal((B, b, b)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(b, dtype=np.float32))
    F_ref = jax.vmap(L._ldl_unblocked)(A)

    def renorm(y):
        y = 0.5 * (y + jnp.swapaxes(y, 1, 2))  # keep input symmetric
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0) + jnp.eye(
            b, dtype=jnp.float32
        )

    chunks = [int(c) for c in sys.argv[1:]] if len(sys.argv) > 1 else [64, 16]
    for chunk in chunks:
        try:
            f = functools.partial(run_fori_t, chunk=chunk)
            F = jax.jit(f)(A)
            err = float(jnp.max(jnp.abs(jnp.tril(F) - jnp.tril(F_ref))))
            t = timed_loop(lambda x: renorm(f(x)), A)
            print(f"fori_t chunk={chunk}: {t*1e3:.3f} ms/call err={err:.2e}")
        except Exception as ex:
            print(f"fori_t chunk={chunk}: FAIL {str(ex)[:150]}")


if __name__ == "__main__":
    main()
