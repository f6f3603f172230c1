"""Fused Pallas kernel for the W-form block back solve.

The production back solve applies K_i^{-1} = s W^T D^{-1} W s per block
(W = L^{-1} from the fused factorization).  In XLA this is two batched
GEMVs (``bij,bj->bi`` then ``bji,bj->bi``): W is read from HBM twice per
apply, and the transposed contraction can materialize W^T (another full
read+write).  Round-3 profile: the two applies per solve were ~8 ms of the
~36 ms Burgers iteration — HBM-bound on the (64, 1024, 1024) f32 W
(/root/repo/docs/benchmarks.md).

This kernel loads each block's W into VMEM ONCE and performs both matvecs
from there: HBM traffic per apply drops from >=2x to exactly 1x |W|.  With
``W`` stored in bf16 (the solver's ``w_store_dtype`` option) traffic halves
again; the matvec accumulates in f32 (convert-on-load in VMEM), and the
solver's f64 iterative refinement absorbs the O(2^-8) storage rounding.

Reference role: the two per-block triangular-solve passes of the back
solve, explicit_schur_complement.py:131-155.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def available() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _apply_kernel(w_ref, d_ref, s_ref, b_ref, out_ref, *, first_matvec):
    # C blocks per grid step (amortizes the per-grid-step overhead —
    # measured ~26 us/step at C=1, dominating the 4 MB DMA + two matvecs);
    # W stays in VMEM for BOTH matvecs.  Vector operands arrive as
    # (C, 1, n) blocks (Pallas TPU requires the last two block dims
    # divisible by (8, 128) or equal to the array dims).
    W = w_ref[...].astype(jnp.float32)  # (C, n, n); convert-on-load if bf16
    d = d_ref[...].astype(jnp.float32)  # (C, 1, n)
    s = s_ref[...].astype(jnp.float32)  # (C, 1, n)
    v = b_ref[...].astype(jnp.float32) * s  # (C, 1, n)
    # y_i = sum_j W[i, j] v[j] — contracts W's LANE dim.  Two lowerings:
    #  "lane": broadcast-multiply + lane reduction.  No W^T copy, but
    #     cross-lane reductions are shuffle chains on the VPU — the
    #     round-4 apply ran at only ~160-260 GB/s effective, and this is
    #     the prime suspect (docs/ROUND4.md round-5 lead 1).
    #  "dot": dot_general contracting the lane dim — Mosaic materializes a
    #     W^T relayout copy in scoped VMEM (~17 MB at C=1, n=1024; fits
    #     since the kernel already raises the budget to 100 MB) but the
    #     contraction runs on the MXU and the copy is VMEM-internal
    #     (~TB/s), not HBM.
    # Selection via PT_APPLY_ALGO at trace time; chip-calibrated.
    if first_matvec == "dot":
        y = lax.dot_general(
            v, W, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (C, 1, n)
    else:
        y = jnp.sum(W * v, axis=2)[:, None, :]  # (C, 1, n)
    d_safe = jnp.where(jnp.abs(d) > 0, d, jnp.ones_like(d))
    z = y / d_safe
    # x_j = sum_i W[i, j] z[i]  (contract W's SUBLANE dim — native MXU
    # layout, no transpose copy)
    x = lax.dot_general(
        z, W, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (C, 1, n)
    out_ref[...] = x * s


def apply_chunk_default(n: int, B: int, itemsize: int = 4) -> int:
    """Blocks per grid step: amortize the per-step overhead while keeping
    W chunk + double buffering within ~2/3 of the 100M VMEM budget."""
    budget = 32 * 2**20  # per buffered W chunk
    c = max(1, budget // (n * n * itemsize))
    return int(min(c, B, 8))


def _first_matvec_algo() -> str:
    """First-matvec lowering (see _apply_kernel): env PT_APPLY_ALGO in
    {"lane", "dot"}; read at TRACE time."""
    import os

    return os.environ.get("PT_APPLY_ALGO", "lane")


@functools.partial(
    jax.jit, static_argnames=("interpret", "chunk", "first_matvec")
)
def winv_apply_fused(
    W, d, s, b, interpret: bool = False, chunk=None, first_matvec=None
):
    """Batched K_i^{-1} b_i with one HBM pass over W per block.

    W: (B, n, n) f32 or bf16 (L^{-1} of the Ruiz-scaled blocks)
    d: (B, n) pivots;  s: (B, nk) Ruiz scales;  b: (B, nk) right-hand sides
    (nk <= n; zero-padded internally).  Returns (B, nk) f32.
    """
    B, n, n2 = W.shape
    assert n == n2
    nk = b.shape[-1]
    bf = b.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    if nk != n:
        bf = jnp.pad(bf, ((0, 0), (0, n - nk)))
        sf = jnp.pad(sf, ((0, 0), (0, n - nk)), constant_values=1.0)
    if chunk is None:
        chunk = apply_chunk_default(n, B, W.dtype.itemsize)
    if first_matvec is None:
        first_matvec = _first_matvec_algo()
    C = max(1, min(chunk, B))
    rem = (-B) % C
    df = d.astype(jnp.float32)
    if rem:
        W = jnp.concatenate(
            [W, jnp.zeros((rem, n, n), dtype=W.dtype)], axis=0
        )
        df = jnp.concatenate([df, jnp.ones((rem, n), jnp.float32)], axis=0)
        sf = jnp.concatenate([sf, jnp.ones((rem, n), jnp.float32)], axis=0)
        bf = jnp.concatenate([bf, jnp.zeros((rem, n), jnp.float32)], axis=0)
    Bp = W.shape[0]
    # vectors as (C, 1, n): TPU block shapes need the last two dims
    # divisible by (8, 128) or equal to the array dims
    vec = pl.BlockSpec((C, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_apply_kernel, first_matvec=first_matvec),
            out_shape=jax.ShapeDtypeStruct((Bp, 1, n), jnp.float32),
            grid=(Bp // C,),
            in_specs=[
                pl.BlockSpec(
                    (C, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                vec,
                vec,
                vec,
            ],
            out_specs=vec,
            interpret=interpret,
            # the (C, n, n) W chunk + double buffering + accumulators
            # exceed the default 16M scoped-VMEM budget (observed at C=1,
            # n=1024); v5e has 128M physical VMEM
            compiler_params=(
                None
                if interpret
                else pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
            ),
        )(W, df[:, None, :], sf[:, None, :], bf[:, None, :])
    return out[:B, 0, :nk]
