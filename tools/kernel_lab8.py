"""Latency-hiding experiment: interleave independent elimination chains.

The SSA panel kernel at C=4 runs ~0.68 us per rank-1 step — ~7x the pure
VPU op time — because the 128 column steps form one serial dependency
chain.  Splitting the chunk into S independent sub-chains and interleaving
their steps in the unroll gives the scheduler S chains to overlap; if the
stall is op latency (not issue bandwidth), time drops toward 1/S.
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


def make_kernel_interleaved(splits):
    def kernel(a_ref, out_ref):
        b = a_ref.shape[-1]
        C = a_ref.shape[0]
        S = splits
        cs = C // S
        row_ids = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
        As = [a_ref[i * cs : (i + 1) * cs] for i in range(S)]
        for j in range(b):
            below = row_ids > jnp.int32(j)
            ls = []
            for i in range(S):
                col = As[i][:, :, j : j + 1]
                piv = col[:, j : j + 1, :]
                piv_safe = jnp.where(jnp.abs(piv) > 0, piv, jnp.ones_like(piv))
                l = jnp.where(below, col / piv_safe, jnp.zeros_like(col))
                out_ref[i * cs : (i + 1) * cs, :, j : j + 1] = jnp.where(
                    below, l, col
                )
                colmask = jnp.where(below, col, jnp.zeros_like(col))
                ls.append((l, colmask))
            for i in range(S):
                l, colmask = ls[i]
                As[i] = As[i] - l * jnp.swapaxes(colmask, 1, 2)
        del As

    return kernel


def run_interleaved(A, chunk, splits):
    B, b, _ = A.shape
    C = min(chunk, B)
    with jax.enable_x64(False):
        return pl.pallas_call(
            make_kernel_interleaved(splits),
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
    from parapint_tpu.ops import pallas_ldl as P

    rng = np.random.default_rng(0)
    b, B = 128, 64
    M = rng.standard_normal((B, b, b)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(b, dtype=np.float32))
    F_ref = jax.vmap(L._ldl_unblocked)(A)

    def renorm(y):
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0) + jnp.eye(
            b, dtype=jnp.float32
        )

    cases = (
        [(int(a), int(s)) for a, s in
         (arg.split(":") for arg in sys.argv[1:])]
        if len(sys.argv) > 1
        else [(8, 2), (16, 4), (4, 2)]
    )
    for chunk, splits in cases:
        try:
            f = functools.partial(run_interleaved, chunk=chunk, splits=splits)
            F = jax.jit(f)(A)
            err = float(jnp.max(jnp.abs(jnp.tril(F) - jnp.tril(F_ref))))
            t = timed_loop(lambda x: renorm(f(x)), A)
            print(
                f"interleaved chunk={chunk} splits={splits}: "
                f"{t*1e3:.3f} ms/call err={err:.2e}"
            )
        except Exception as ex:
            print(
                f"interleaved chunk={chunk} splits={splits}: FAIL {str(ex)[:120]}"
            )


if __name__ == "__main__":
    main()
