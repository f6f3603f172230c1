"""Is the ~1.4 ms/in-graph pallas panel call launch overhead or VPU compute?

Three probes, all amortized inside one dispatch (20 reps):
  1. chain k=1 on (64,128,128)      -> per-call cost at grid=16
  2. chain k=8 on (8,128,128)       -> grid=2 per call: if time/call drops
                                       ~8x, it's per-grid-step compute; if
                                       flat, it's per-call launch overhead
  3. an x8-fused kernel: 8 sequential factor rounds INSIDE one pallas call
                                     -> direct prototype of merging the
                                       panel chain into one launch
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


def _factor_body(A):
    """One unrolled 128-step factor round on a (C, b, b) value."""
    b = A.shape[-1]
    row_ids = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    cols = []
    for j in range(b):
        col = A[:, :, j : j + 1]
        piv = A[:, j : j + 1, j : j + 1]
        piv_safe = jnp.where(jnp.abs(piv) > 0, piv, jnp.ones_like(piv))
        below = row_ids > jnp.int32(j)
        l = jnp.where(below, col / piv_safe, jnp.zeros_like(col))
        cols.append(jnp.where(below, l, col))
        colmask = jnp.where(below, col, jnp.zeros_like(col))
        A = A - l * jnp.swapaxes(colmask, 1, 2)
    return jnp.concatenate(cols, axis=2)


def _kernel_x8(a_ref, out_ref):
    A = a_ref[...]
    for r in range(8):
        A = _factor_body(A)
        # renormalize so the next round is numerically sane
        A = A / (jnp.max(jnp.abs(A)) + 1.0)
    out_ref[...] = A


def run_x8(A, chunk=4):
    B, b, _ = A.shape
    C = min(chunk, B)
    return pl.pallas_call(
        _kernel_x8,
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        grid=(B // C,),
        in_specs=[pl.BlockSpec((C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(A)


def main():
    from parapint_tpu.ops import pallas_ldl as P

    rng = np.random.default_rng(0)
    bs = 128

    def mk(B):
        M = rng.standard_normal((B, bs, bs)).astype(np.float32)
        return jnp.asarray(
            M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(bs, dtype=np.float32)
        )

    def renorm(y):
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0) + jnp.eye(
            bs, dtype=jnp.float32
        )

    def chain(x, k):
        y = x
        for _ in range(k):
            y = P.ldl_panels_batched(y)
        return renorm(y)

    t = timed_loop(functools.partial(chain, k=1), mk(64))
    print(f"chain k=1 B=64 (grid 16): {t*1e3:.3f} ms/iter")

    t = timed_loop(functools.partial(chain, k=8), mk(8))
    print(f"chain k=8 B=8 (grid 2/call): {t*1e3:.3f} ms/iter -> {t/8*1e3:.3f}/call")

    t = timed_loop(lambda x: renorm(run_x8(x)), mk(64))
    print(f"x8-fused kernel B=64: {t*1e3:.3f} ms/iter (8 rounds in ONE call)")


if __name__ == "__main__":
    main()
