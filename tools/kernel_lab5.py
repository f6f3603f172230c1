"""Jitter-free factor timings: 20 iterations inside ONE dispatch.

The relay adds ±2 ms noise per dispatch; a lax.fori_loop repeating the
factorization on its own output amortizes it away.  Times the full batched
factor variants and the isolated pallas-call chain at production shape
(64, 1024, 1024) f32.
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

REPS = 20


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed_loop(step, x0, reps=REPS, warm=2):
    """step: x -> x (same shape/dtype).  Returns seconds per step."""

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


def main():
    from parapint_tpu.ops import ldl as L
    from parapint_tpu.ops import pallas_ldl as P

    N, n, bs = 64, 1024, 128
    rng = np.random.default_rng(0)
    M = rng.standard_normal((N, n, n)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(n, dtype=np.float32))

    def renorm(x):
        # keep values bounded so 20 self-applications stay finite
        return x / jnp.maximum(jnp.max(jnp.abs(x)), 1.0) + 0.1 * jnp.eye(
            n, dtype=jnp.float32
        )

    t = timed_loop(lambda x: renorm(x), A)
    print(f"renorm alone: {t*1e3:.3f} ms")

    t = timed_loop(lambda x: renorm(L.ldl_factor_batched(x, 128)[0]), A)
    print(f"ldl_factor_batched: {t*1e3:.3f} ms/call")

    t = timed_loop(lambda x: renorm(L.ldl_factor_winv_batched(x, 128)[2]), A)
    print(f"ldl_factor_winv_batched: {t*1e3:.3f} ms/call")

    # chain of 8 dependent pallas panel calls (no matmuls) on (64,128,128)
    x0 = A[:, :bs, :bs]

    def chain8(x):
        y = x
        for _ in range(8):
            y = P.ldl_panels_batched(y)
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0) + jnp.eye(
            bs, dtype=jnp.float32
        )

    t = timed_loop(chain8, x0)
    print(f"8x pallas panel chain: {t*1e3:.3f} ms (-> per call {t/8*1e3:.3f})")

    # single big einsum for MXU reference
    def mm(x):
        y = jnp.einsum("nij,njk->nik", x, x, preferred_element_type=jnp.float32)
        return renorm(y)

    t = timed_loop(mm, A)
    print(f"bmm_1024 highest: {t*1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
