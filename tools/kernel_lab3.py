"""Where do the 16 ms of ldl_factor_batched (64, 1024, 1024) go?  On-chip
measurement of each loop piece at the exact shapes of the benchmark's
factor sweep (tools/profile_numeric.py: factor = 16.6 ms, panels = 0.6 ms).
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
    """Value-dependent readback: block_until_ready on the axon relay can
    complete at enqueue time; pulling a data-dependent scalar to the host
    cannot."""
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


FLOOR = None


def report(name, t, flops=None):
    adj = t - FLOOR
    extra = f" {flops/adj/1e12:.1f} TF/s" if flops else ""
    print(f"{name}: {adj*1e3:.2f} ms{extra}")


def main():
    global FLOOR
    N, n, bs = 64, 1024, 128
    nb = n // bs
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((N, n, n)).astype(np.float32))

    FLOOR, _ = timed(jax.jit(lambda x: x + 1), jnp.zeros(8, jnp.float32))
    print(f"floor {FLOOR*1e3:.2f} ms")

    # 0) peak check: one big batched matmul at default/high/highest
    B = jnp.asarray(rng.standard_normal((N, n, n)).astype(np.float32))
    fl = 2 * N * n**3
    for prec in ("default", "high", "highest"):
        f = jax.jit(
            lambda a, b, p=prec: jnp.einsum(
                "nij,njk->nik", a, b, precision=p,
                preferred_element_type=jnp.float32,
            )
        )
        t, _ = timed(f, A, B)
        report(f"bmm_{n} prec={prec}", t, fl)

    # 1) the X einsums of the loop: sum_k (N, r_k, bs) x (N, bs, bs)
    def x_einsums(T0, Wk):
        outs = []
        for k in range(nb):
            r = n - (k + 1) * bs
            if r == 0:
                break
            rest = jax.lax.dynamic_slice(
                T0, (0, 0, 0), (N, r, bs)
            )
            outs.append(
                jnp.einsum(
                    "nij,nkj->nik", rest, Wk,
                    preferred_element_type=jnp.float32,
                ).sum()
            )
        return sum(outs)

    Wk = jnp.asarray(rng.standard_normal((N, bs, bs)).astype(np.float32))
    fl = sum(2 * N * (n - (k + 1) * bs) * bs * bs for k in range(nb))
    t, _ = timed(jax.jit(x_einsums), A, Wk)
    report("X einsums (sum over 7 panel steps)", t, fl)

    # 2) the trailing updates: sum_k (N, r, bs) x (N, bs, r) + subtract
    def trailing(T):
        acc = 0.0
        for k in range(nb):
            r = n - (k + 1) * bs
            if r == 0:
                break
            L21 = jax.lax.dynamic_slice(T, (0, 0, 0), (N, r, bs))
            Tt = jax.lax.dynamic_slice(T, (0, 0, 0), (N, r, r))
            Tn = Tt - jnp.einsum(
                "nij,nkj->nik", L21, L21, preferred_element_type=jnp.float32
            )
            acc = acc + Tn.sum()
        return acc

    fl = sum(2 * N * (n - (k + 1) * bs) ** 2 * bs for k in range(nb))
    t, _ = timed(jax.jit(trailing), A)
    report("trailing updates (7 steps)", t, fl)

    # 3) the real ldl_factor_batched, at block sizes 128 and 64
    from parapint_tpu.ops import ldl as L

    for blk in (128, 64):
        t, _ = timed(
            jax.jit(functools.partial(L.ldl_factor_batched, block_size=blk)), A
        )
        report(f"ldl_factor_batched bs={blk}", t, (1 / 3) * N * n**3 * 2)

    # 4) recursive variant comparison (static halving; less traffic)
    def rec(Ax):
        return jax.vmap(lambda a: L._ldl_recursive(a, 128))(Ax)

    try:
        t, _ = timed(jax.jit(rec), A)
        report("vmapped _ldl_recursive bs=128", t, (1 / 3) * N * n**3 * 2)
    except Exception as e:
        print("recursive FAIL", str(e)[:120])


if __name__ == "__main__":
    main()
