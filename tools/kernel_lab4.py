"""Per-panel-step cost of ldl_factor_batched: time truncated k-step sweeps.

lab3: the full 8-step sweep on (64, 1024, 1024) is ~15 ms while ALL of its
matmul work is ~1.4 ms at the measured MXU rate and the panel kernels are
~0.6 ms.  Hypotheses: fixed per-pallas-call overhead inside a jit program,
or the sequential slice/update chain.  Slope of time vs k tells the
per-step cost; a pallas-free variant separates kernel overhead from XLA
loop structure.
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


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed(f, *a, reps=6):
    out = f(*a)
    _force(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from parapint_tpu.ops import ldl as L
    from parapint_tpu.ops import pallas_ldl as P

    N, n, bs = 64, 1024, 128
    rng = np.random.default_rng(0)
    M = rng.standard_normal((N, n, n)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(n, dtype=np.float32))

    floor, _ = timed(jax.jit(lambda x: x + 1), jnp.zeros(8, jnp.float32))
    print(f"floor {floor*1e3:.2f} ms")

    def sweep(A, steps, panel):
        """First `steps` panel steps of the right-looking sweep."""
        T = A
        outs = []
        for k in range(steps):
            Fkk = panel(T[:, :bs, :bs])
            dk = jnp.diagonal(Fkk, axis1=1, axis2=2)
            Lkk = jnp.tril(Fkk, -1) + jnp.eye(bs, dtype=jnp.float32)[None]
            Winv = L._unit_lower_inv_b(Lkk)
            rest = T[:, bs:, :bs]
            X = jnp.einsum("nij,nkj->nik", rest, Winv,
                           preferred_element_type=jnp.float32)
            dk_safe = jnp.where(jnp.abs(dk) > 0, dk, 1.0)
            L21 = X / dk_safe[:, None, :]
            T = T[:, bs:, bs:] - jnp.einsum(
                "nij,nkj->nik", L21, X, preferred_element_type=jnp.float32
            )
            outs.append(Fkk.sum() + L21.sum())
        return sum(outs) + T.sum()

    for steps in (1, 2, 4, 7):
        t, _ = timed(
            jax.jit(functools.partial(sweep, steps=steps,
                                      panel=P.ldl_panels_batched)), A
        )
        print(f"pallas sweep k={steps}: {(t-floor)*1e3:.2f} ms")

    # pallas-free: vmapped XLA unblocked loop as the panel factorization
    xla_panel = jax.vmap(L._ldl_unblocked)
    for steps in (1, 4):
        t, _ = timed(
            jax.jit(functools.partial(sweep, steps=steps, panel=xla_panel)), A
        )
        print(f"xla-panel sweep k={steps}: {(t-floor)*1e3:.2f} ms")

    # chain of k pallas calls alone (data-dependent, no trailing updates)
    def chain(x, k):
        y = x
        for _ in range(k):
            y = P.ldl_panels_batched(y)
        return y.sum()

    for k in (1, 4, 8):
        x = A[:, :bs, :bs]
        t, _ = timed(jax.jit(functools.partial(chain, k=k)), x)
        print(f"pallas chain k={k}: {(t-floor)*1e3:.2f} ms")

    # panel inverse cost alone (Neumann doubling on (64,128,128))
    Lk = jnp.tril(A[:, :bs, :bs], -1) + jnp.eye(bs, dtype=jnp.float32)[None]
    t, _ = timed(jax.jit(lambda z: L._unit_lower_inv_b(z).sum()), Lk)
    print(f"unit_lower_inv_b (64,128,128): {(t-floor)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
