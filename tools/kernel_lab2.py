"""Follow-up on-chip kernel measurements (see tools/kernel_lab.py)."""

import builtins
import functools
import time

builtins.print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=7):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from parapint_tpu.ops import ldl, pallas_ldl

    rng = np.random.default_rng(0)
    b = 128
    B = 64
    M = rng.standard_normal((B, b, b)).astype(np.float32)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(b, dtype=np.float32))

    F_ref = jax.vmap(ldl._ldl_unblocked)(A)

    for chunk in (4, 2, 64):
        try:
            f = functools.partial(pallas_ldl.ldl_panels_batched, chunk=chunk)
            t, F = bench(jax.jit(f), A)
            e1 = float(jnp.max(jnp.abs(jnp.tril(F) - jnp.tril(F_ref))))
            print(f"ssa_factor chunk={chunk}: {t*1e3:.3f} ms err={e1:.2e}")
        except Exception as ex:
            print(f"ssa_factor chunk={chunk}: FAIL {str(ex)[:120]}")

    # winv kernel re-check at the clamped default
    try:
        t, (F, W) = bench(jax.jit(pallas_ldl.ldl_panels_batched_winv), A)
        e1 = float(jnp.max(jnp.abs(jnp.tril(F) - jnp.tril(F_ref))))
        print(f"winv default(clamped): {t*1e3:.3f} ms err={e1:.2e}")
    except Exception as ex:
        print(f"winv default: FAIL {str(ex)[:120]}")

    # full fused factor+inverse pipeline at a production-like block size:
    # one Burgers KKT block is ~ (64, 512, 512) at nfe_x=50
    n = 512
    M2 = rng.standard_normal((B, n, n)).astype(np.float32)
    A2 = jnp.asarray(
        M2 @ np.swapaxes(M2, 1, 2) + 0.1 * np.eye(n, dtype=np.float32)
    )
    for name, fn in (
        ("ldl_factor_winv_batched", lambda x: ldl.ldl_factor_winv_batched(x, 128)),
        ("ldl_factor_batched", lambda x: ldl.ldl_factor_batched(x, 128)),
    ):
        try:
            t, out = bench(jax.jit(fn), A2)
            print(f"{name} (64,512,512): {t*1e3:.3f} ms")
        except Exception as ex:
            print(f"{name}: FAIL {str(ex)[:160]}")


if __name__ == "__main__":
    main()
