"""In-place (ref-resident) panel kernels at large chunk, with the x64 guard.

The chunk=4 cap exists because the SSA-form kernel keeps ~40 live (C,b,b)
buffers; per-step latency then serializes (B/C)*b rank-1 steps (~11 ms for
the benchmark factor).  A ref-resident kernel keeps ~2 buffers live, so C
can grow toward B=64 and the sequential step count drops by B/C.

Round-1 of this experiment (tools/kernel_lab.py) "failed to lower" — but it
called pallas_call without jax.enable_x64(False); parapint_tpu enables x64
globally and Mosaic cannot lower the resulting i64 scalars (same signature
as the x8-kernel failure: func.return (i32, i64, i64)).  Retry with the
guard, correctness-checked, at chunks 8..64.
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


def _kernel_factor_inplace(a_ref, out_ref):
    """Factor with the working matrix resident in out_ref (2 live buffers:
    the column being processed and the rank-1 outer product)."""
    b = a_ref.shape[-1]
    row_ids = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    out_ref[...] = a_ref[...]
    for j in range(b):
        col = out_ref[:, :, j : j + 1]
        piv = col[:, j : j + 1, :]
        piv_safe = jnp.where(jnp.abs(piv) > 0, piv, jnp.ones_like(piv))
        below = row_ids > jnp.int32(j)
        l = jnp.where(below, col / piv_safe, jnp.zeros_like(col))
        colmask = jnp.where(below, col, jnp.zeros_like(col))
        out_ref[...] = out_ref[...] - l * jnp.swapaxes(colmask, 1, 2)
        out_ref[:, :, j : j + 1] = jnp.where(below, l, col)


def run_factor_inplace(A, chunk):
    B, b, _ = A.shape
    C = min(chunk, B)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _kernel_factor_inplace,
            out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
            grid=(B // C,),
            in_specs=[
                pl.BlockSpec((C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        )(A)


def main():
    from parapint_tpu.ops import ldl as L

    rng = np.random.default_rng(0)
    b, B = 128, 64
    M = rng.standard_normal((B, b, b)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(b, dtype=np.float32))

    F_ref = jax.vmap(L._ldl_unblocked)(A)

    def renorm(y):
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0) + jnp.eye(
            b, dtype=jnp.float32
        )

    chunks = (
        [int(c) for c in sys.argv[1:]] if len(sys.argv) > 1 else [16, 32, 8]
    )
    for chunk in chunks:
        try:
            f = functools.partial(run_factor_inplace, chunk=chunk)
            F = jax.jit(f)(A)
            err = float(jnp.max(jnp.abs(jnp.tril(F) - jnp.tril(F_ref))))
            t = timed_loop(lambda x: renorm(f(x)), A)
            print(f"inplace_factor chunk={chunk}: {t*1e3:.3f} ms/call err={err:.2e}")
        except Exception as ex:
            print(f"inplace_factor chunk={chunk}: FAIL {str(ex)[:120]}")


if __name__ == "__main__":
    main()
