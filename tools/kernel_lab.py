"""On-chip kernel lab: one parameterized tool for all TPU kernel experiments.

Consolidates the round-3 kernel_lab{,2..9}.py one-offs into subcommands.
Run manually on the real chip:

    env PYTHONPATH=/root/.axon_site:/root/repo python tools/kernel_lab.py <cmd> [args]

Subcommands
-----------
  panels   chunk sweep of the batched panel kernels (per-column SSA form
           and the round-4 slab form) at a given (B, b)
  factor   amortized timings of the full batched factor variants at the
           production shape (64, 1024, 1024), per panel algorithm
  mxu      batched-matmul MXU rates per precision at (B, n, n)
  solve    back-solve phase pieces: W applies (f32 / bf16), block-tridiag
           coupling solve, full solver solve()
  dispatch per-dispatch relay floor (trivial jitted fn)

Measurement methodology (MANDATORY on this host — see the round-3 notes):
  * `jax.block_until_ready` is UNRELIABLE through the TPU relay (it can
    complete at enqueue time).  Every timing forces a value-dependent
    scalar readback (`_force`).
  * The relay adds a ~27 ms per-dispatch floor and +-2 ms jitter; all
    kernel timings amortize REPS=20 repetitions inside ONE dispatch
    (`lax.fori_loop` with a renormalizing step), then take best-of-3.

Dead ends measured in round 3 (do not retry blindly):
  * per-column kernel at chunk 8..64: 23-29 ms (live-range spill; ~40 live
    (b,b) buffers per chunk element in the unrolled SSA graph)
  * per-column IN-PLACE (ref-resident) kernel at large chunk: lowers fine
    under jax.enable_x64(False), but 2.1 ms/call vs 1.4 ms for SSA chunk=4
    (the full-buffer VMEM rewrite per column step dominates)
  * interleaved independent elimination chains: 2.2 ms (register pressure
    beats latency hiding)
  * lax.fori_loop panel body in transposed space: Mosaic `dynamic_slice on
    values` unimplemented — fully-unrolled forms only
"""

import argparse
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
    """Value-dependent scalar readback over every leaf (see module doc)."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        a = jnp.asarray(leaf)
        total += float(jnp.sum(jnp.abs(a.astype(jnp.float32))))
    return total


def timed_loop(step, x0, reps=REPS, consts=()):
    """Amortized seconds per `step` application, best of 3 dispatches.

    ``consts``: extra operands passed as jit ARGUMENTS (a step that merely
    closes over a large array would inline it as an HLO constant — a
    268 MB W blows the relay's remote-compile payload limit, HTTP 413).
    """

    @jax.jit
    def run(x, *cs):
        return lax.fori_loop(0, reps, lambda i, x: step(x, *cs), x)

    _force(run(x0, *consts))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(run(x0, *consts))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def timed_once(f, *a, reps=3):
    """Whole-dispatch wall time (includes the ~27 ms relay floor)."""
    _force(f(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def make_spd(B, n, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, n)).astype(dtype)
    return jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.1 * np.eye(n, dtype=dtype))


def _renorm(n):
    def f(x):
        return x / jnp.maximum(jnp.max(jnp.abs(x)), 1.0) + 0.1 * jnp.eye(
            n, dtype=x.dtype
        )

    return f


# -- subcommands --------------------------------------------------------------


def cmd_panels(args):
    from parapint_tpu.ops import ldl as L
    from parapint_tpu.ops import pallas_ldl as P

    B, b = args.B, args.b
    A = make_spd(B, b)
    renorm = _renorm(b)
    F_ref = jax.vmap(L._ldl_unblocked)(A)

    def check(out):
        return float(jnp.max(jnp.abs(jnp.tril(out) - jnp.tril(F_ref)))) / max(
            1.0, float(jnp.max(jnp.abs(F_ref)))
        )

    for algo in args.algos:
        for chunk in args.chunks:
            try:
                if algo == "column":
                    fn = functools.partial(P.ldl_panels_batched, chunk=chunk)
                elif algo == "column_winv":
                    fn = lambda x, c=chunk: P.ldl_panels_batched_winv(x, chunk=c)[0]
                elif algo == "slab":
                    fn = functools.partial(
                        P.ldl_panels_slab, chunk=chunk, slab=args.slab
                    )
                elif algo == "slab_winv":
                    fn = lambda x, c=chunk: P.ldl_panels_slab_winv(
                        x, chunk=c, slab=args.slab
                    )[0]
                else:
                    raise ValueError(algo)
                err = check(jax.jit(fn)(A))
                t = timed_loop(lambda x: renorm(fn(x)), A)
                print(
                    f"{algo} chunk={chunk}: {t*1e3:.3f} ms/call rel_err={err:.2e}"
                )
            except Exception as ex:
                print(f"{algo} chunk={chunk}: FAIL {str(ex)[:140]}")


def cmd_factor(args):
    from parapint_tpu.ops import ldl as L
    from parapint_tpu.ops import pallas_ldl as P

    N, n, bs = args.B, args.n, 128
    A = make_spd(N, n)
    renorm = _renorm(n)

    t = timed_loop(renorm, A)
    print(f"renorm alone: {t*1e3:.3f} ms")
    t = timed_loop(lambda x: renorm(L.ldl_factor_batched(x, bs)[0]), A)
    print(f"ldl_factor_batched: {t*1e3:.3f} ms/call")
    t = timed_loop(lambda x: renorm(L.ldl_factor_winv_batched(x, bs)[2]), A)
    print(f"ldl_factor_winv_batched: {t*1e3:.3f} ms/call")

    x0 = A[:, :bs, :bs]
    rb = _renorm(bs)

    def chain8(panel_fn):
        def f(x):
            y = x
            for _ in range(n // bs):
                y = panel_fn(y)
            return rb(y)

        return f

    t = timed_loop(chain8(P.ldl_panels_batched), x0)
    print(f"{n//bs}x column panel chain: {t*1e3:.3f} ms")
    t = timed_loop(chain8(functools.partial(P.ldl_panels_slab, slab=8)), x0)
    print(f"{n//bs}x slab panel chain: {t*1e3:.3f} ms")


def cmd_mxu(args):
    A = make_spd(args.B, args.n)
    renorm = _renorm(args.n)
    flops = 2.0 * args.B * args.n**3
    for prec in ("default", "high", "highest"):
        def mm(x, p=prec):
            y = jnp.einsum(
                "nij,njk->nik", x, x, precision=p,
                preferred_element_type=jnp.float32,
            )
            return renorm(y)

        t = timed_loop(mm, A)
        print(f"bmm_{args.n} {prec}: {t*1e3:.3f} ms = {flops/t/1e12:.1f} TF/s")


def cmd_solve(args):
    """Back-solve pieces at the bench production shape.

    Compares the fused Pallas apply (one HBM pass over W) with the XLA
    two-GEMV form, in f32 and with bf16-stored W."""
    from parapint_tpu.ops.ldl import ldl_factor_winv_batched
    from parapint_tpu.ops import winv_apply as wk

    N, n = args.B, args.n
    A = make_spd(N, n)
    LD, d, W = jax.jit(
        functools.partial(ldl_factor_winv_batched, block_size=128)
    )(A)
    s = jnp.ones((N, n), dtype=jnp.float32)
    b = jnp.ones((N, n), dtype=jnp.float32)
    gb = N * n * n * 4 / 1e9

    def renorm(x):
        return x / jnp.maximum(jnp.max(jnp.abs(x)), 1.0) + 1.0

    def xla_apply(bb, Wc, dc, sc):
        cdt = jnp.float32
        Wf = Wc.astype(cdt)
        d_safe = jnp.where(jnp.abs(dc.astype(cdt)) > 0, dc.astype(cdt), 1.0)
        y = jnp.einsum("bij,bj->bi", Wf, bb * sc, preferred_element_type=cdt)
        x = jnp.einsum(
            "bji,bj->bi", Wf, y / d_safe, preferred_element_type=cdt
        )
        return renorm(x * sc)

    def fused_apply(bb, Wc, dc, sc):
        return renorm(wk.winv_apply_fused(Wc, dc, sc, bb))

    for name, Wv in (("f32", W), ("bf16", W.astype(jnp.bfloat16))):
        bytes_w = gb if name == "f32" else gb / 2
        try:
            t = timed_loop(xla_apply, b, consts=(Wv, d, s))
            print(
                f"XLA 2-GEMV apply W={name} ({bytes_w:.2f} GB/read x2): "
                f"{t*1e3:.3f} ms = {2*bytes_w/t:.0f} GB/s effective"
            )
        except Exception as ex:
            print(f"XLA apply W={name}: FAIL {str(ex)[:120]}")
        try:
            t = timed_loop(fused_apply, b, consts=(Wv, d, s))
            print(
                f"fused Pallas apply W={name} ({bytes_w:.2f} GB/read x1): "
                f"{t*1e3:.3f} ms = {bytes_w/t:.0f} GB/s effective"
            )
        except Exception as ex:
            print(f"fused apply W={name}: FAIL {str(ex)[:120]}")


def cmd_bw(args):
    """Pure-DMA ceiling probe: a kernel that only reads (C, n, n) W chunks
    from HBM and writes a per-column reduction.  Distinguishes 'the fused
    apply is DMA-bound' (this runs at the same ~160 GB/s) from 'its
    compute/layout is the issue' (this runs near the ~800 GB/s HBM peak)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, n = args.B, args.n
    W = make_spd(N, n)
    gb = N * n * n * 4 / 1e9

    for C in (1, 4, 8):
        def kern(w_ref, o_ref):
            o_ref[...] = jnp.sum(w_ref[...], axis=1, keepdims=True)

        def reduce_w(x, Wc):
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((N, 1, n), jnp.float32),
                grid=(N // C,),
                in_specs=[
                    pl.BlockSpec(
                        (C, n, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (C, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 2**20
                ),
            )(Wc)
            return x + jnp.sum(out) * 1e-30

        with jax.enable_x64(False):
            t = timed_loop(reduce_w, jnp.float32(0), consts=(W,))
        print(f"read-only reduce C={C}: {t*1e3:.3f} ms = {gb/t:.0f} GB/s")


def cmd_dispatch(args):
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.ones(8, dtype=jnp.float32)
    t = timed_once(f, x, reps=5)
    print(f"per-dispatch floor: {t*1e3:.2f} ms")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("panels")
    pp.add_argument("--B", type=int, default=64)
    pp.add_argument("--b", type=int, default=128)
    pp.add_argument("--slab", type=int, default=8)
    pp.add_argument("--chunks", type=int, nargs="+", default=[4, 8, 16, 32, 64])
    pp.add_argument(
        "--algos", nargs="+",
        default=["column", "slab", "slab_winv"],
        choices=["column", "column_winv", "slab", "slab_winv"],
    )
    pp.set_defaults(fn=cmd_panels)

    pf = sub.add_parser("factor")
    pf.add_argument("--B", type=int, default=64)
    pf.add_argument("--n", type=int, default=1024)
    pf.set_defaults(fn=cmd_factor)

    pm = sub.add_parser("mxu")
    pm.add_argument("--B", type=int, default=64)
    pm.add_argument("--n", type=int, default=1024)
    pm.set_defaults(fn=cmd_mxu)

    ps = sub.add_parser("solve")
    ps.add_argument("--B", type=int, default=64)
    ps.add_argument("--n", type=int, default=1024)
    ps.set_defaults(fn=cmd_solve)

    pb = sub.add_parser("bw")
    pb.add_argument("--B", type=int, default=64)
    pb.add_argument("--n", type=int, default=1024)
    pb.set_defaults(fn=cmd_bw)

    pd = sub.add_parser("dispatch")
    pd.set_defaults(fn=cmd_dispatch)

    args = p.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    args.fn(args)


if __name__ == "__main__":
    main()
