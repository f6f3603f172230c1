"""Pallas TPU kernel for the LDL^T base-case panel factorization.

The blocked LDL^T (ops/ldl.py) reduces to: per 128x128 diagonal panel, a
sequential loop of 128 rank-1 updates.  In pure XLA each step round-trips
the whole panel through HBM (the loop-carried buffer), costing ~60us/step;
this kernel keeps the panel resident in VMEM for all 128 steps, so the
entire batched base-case factorization is one kernel launch with one
HBM read + one write per panel.

The kernel factors a batch of (b, b) symmetric blocks in packed form:
strict lower triangle = unit-lower L, diagonal = D (garbage above), exactly
matching ops.ldl._ldl_unblocked.
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


def _panel_kernel(a_ref, out_ref):
    # Fully unrolled with static slices: Mosaic does not lower dynamic
    # lane-dimension indexing, and a static unroll keeps the whole panel in
    # vector registers/VMEM as one dataflow graph.
    b = a_ref.shape[-1]
    A = a_ref[0]
    row_ids = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    cols = []
    for j in range(b):
        col = A[:, j : j + 1]  # (b, 1)
        piv = col[j : j + 1, :]  # (1, 1)
        piv_safe = jnp.where(jnp.abs(piv) > 0, piv, jnp.ones_like(piv))
        # keep index scalars int32: under jax_enable_x64 a Python int would
        # promote the comparison to int64, which Mosaic cannot lower
        below = row_ids > jnp.int32(j)
        l = jnp.where(below, col / piv_safe, jnp.zeros_like(col))
        cols.append(jnp.where(below, l, col))
        colmask = jnp.where(below, col, jnp.zeros_like(col))
        A = A - l * colmask.T
    out_ref[0] = jnp.concatenate(cols, axis=1)


def available() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _panel_kernel_batched(a_ref, out_ref):
    """Factor a CHUNK of panels in one kernel instance.

    The single-panel kernel above serializes over the grid (one TensorCore
    per chip), leaving the VPU almost idle on each tiny (b, b) rank-1
    update.  Here every one of the b sequential column steps operates on
    the whole (C, b, b) chunk at once — the batch dimension provides the
    vector parallelism the step itself lacks.  Measured ~10x faster than
    the gridded form at C=64, b=128.
    """
    b = a_ref.shape[-1]
    A = a_ref[...]  # (C, b, b)
    row_ids = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    for j in range(b):
        col = A[:, :, j : j + 1]  # (C, b, 1)
        piv = A[:, j : j + 1, j : j + 1]  # (C, 1, 1)
        piv_safe = jnp.where(jnp.abs(piv) > 0, piv, jnp.ones_like(piv))
        below = row_ids > jnp.int32(j)
        l = jnp.where(below, col / piv_safe, jnp.zeros_like(col))
        out_ref[:, :, j : j + 1] = jnp.where(below, l, col)
        # trailing rank-1 update: A[c, r, k] -= l[c, r] * (d_j l_k)[c, k].
        # d_j*l_k MUST be read from the pivot COLUMN (transposed), exactly
        # like the single-panel kernel: reading row j instead (the trailing
        # block is only symmetric up to roundoff — Ruiz scaling and the
        # updates themselves break exact symmetry at the ulp level) feeds
        # the upper-triangle values into a factorization whose downstream
        # use (W^T D^-1 W applies, SC formation) is derived from the lower
        # triangle; under the KKT's element growth that inconsistency cost
        # ~2x interior-point iterations on the Burgers benchmark.
        colmask = jnp.where(below, col, jnp.zeros_like(col))
        A = A - l * jnp.swapaxes(colmask, 1, 2)


def _panel_kernel_batched_winv(a_ref, out_ref, w_ref):
    """Chunk-batched panel factorization that ALSO emits W = L^{-1}.

    L is a product of elementary Gauss transforms E_j = I + l_j e_j^T, so
    L^{-1} = (I - l_{b-1} e^T) ... (I - l_0 e_0^T) accumulates with one
    extra VMEM-resident rank-1 update per column step:
    W <- W - l_j * (row j of W).  This replaces the Neumann-doubling matmul
    chains the XLA path needs for every panel inverse (the largest
    fixed overhead of the blocked factorization: ~14 HBM-bound (C,b,b)
    matmuls per panel) with in-register VPU work.
    """
    b = a_ref.shape[-1]
    A = a_ref[...]  # (C, b, b)
    row_ids = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    col_ids = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
    eye = jnp.where(row_ids == col_ids, jnp.float32(1), jnp.float32(0))
    W = jnp.zeros_like(A) + eye.astype(A.dtype)
    for j in range(b):
        col = A[:, :, j : j + 1]  # (C, b, 1)
        piv = A[:, j : j + 1, j : j + 1]  # (C, 1, 1)
        piv_safe = jnp.where(jnp.abs(piv) > 0, piv, jnp.ones_like(piv))
        below = row_ids > jnp.int32(j)
        l = jnp.where(below, col / piv_safe, jnp.zeros_like(col))
        out_ref[:, :, j : j + 1] = jnp.where(below, l, col)
        # pivot-COLUMN read for the rank-1 (see _panel_kernel_batched)
        colmask = jnp.where(below, col, jnp.zeros_like(col))
        A = A - l * jnp.swapaxes(colmask, 1, 2)
        # W accumulation: row j of W is final at step j (later steps only
        # modify rows > j)
        W = W - l * W[:, j : j + 1, :]
    w_ref[...] = W


# Scoped-VMEM stack model for the winv kernel, MEASURED on a v5e chip
# (tools/kernel_lab.py): Mosaic keeps ~40 live (b, b) f32 intermediates per
# chunk element through the unrolled column loop (the compiler reported
# 42.32M scoped at chunk=16, b=128 -> 2.645M/element = ~40 panels).  The
# scoped limit is 16M; budget 12M for safety margin.
_WINV_LIVE_PANELS = 40
_SCOPED_VMEM_BUDGET = 12 * 2**20


def winv_max_chunk(b: int) -> int:
    """Largest chunk for :func:`ldl_panels_batched_winv` that fits the
    scoped-VMEM stack at panel size ``b`` (empirical model above)."""
    per_elem = _WINV_LIVE_PANELS * 4 * b * b
    return max(0, _SCOPED_VMEM_BUDGET // per_elem)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def ldl_panels_batched_winv(
    A: jax.Array, chunk: int | None = None, interpret: bool = False
):
    """Batched panel factorization + panel inverse: (B, b, b) ->
    (packed (B, b, b), W = L^{-1} (B, b, b)).

    Default chunk: the measured sweet spot (:func:`panel_chunk_default`),
    additionally clamped to the measured scoped-VMEM budget
    (``winv_max_chunk``) — at b=128 the effective chunk is 4 (validated on
    chip: 0.092 ms for (64, 128, 128); chunk>=8 exceeds the 16M scoped
    limit and fails to compile, the round-2 benchmark crash)."""
    B, b, b2 = A.shape
    assert b == b2
    if chunk is None:
        chunk = panel_chunk_default(b)
    if not interpret:
        chunk = min(chunk, max(1, winv_max_chunk(b)))
    C = min(chunk, B)
    rem = (-B) % C
    if rem:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), (rem, b, b))
        A = jnp.concatenate([A, eye], axis=0)
    with jax.enable_x64(False):
        out, w = pl.pallas_call(
            _panel_kernel_batched_winv,
            out_shape=(
                jax.ShapeDtypeStruct(A.shape, A.dtype),
                jax.ShapeDtypeStruct(A.shape, A.dtype),
            ),
            grid=(A.shape[0] // C,),
            in_specs=[
                pl.BlockSpec(
                    (C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=(
                pl.BlockSpec(
                    (C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ),
            interpret=interpret,
        )(A)
    return out[:B], w[:B]


def panel_chunk_default(b: int) -> int:
    """Measured-on-chip chunk sweet spot for the batched panel kernels.

    v5e measurements at b=128, B=64 (tools/kernel_lab*.py): chunk=4 runs the
    whole batch in 0.07-0.09 ms while chunk in {2, 8, 16, 32} takes 23-29 ms
    (where it compiles at all) — a ~300x cliff.  C*b = 512 keeps each
    column-step operand at 4 f32 vregs per (8, 128) tile row; larger chunks
    blow the live-range budget (winv: scoped-VMEM OOM), smaller ones starve
    the VPU.
    """
    return max(1, min(16, 512 // b))


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def ldl_panels_batched(
    A: jax.Array, chunk: int | None = None, interpret: bool = False
) -> jax.Array:
    """Batched panel factorization: (B, b, b) -> packed (B, b, b), with the
    batch axis *inside* the kernel (see _panel_kernel_batched).

    ``chunk`` bounds VMEM (2 * chunk * b * b * 4 bytes of refs); B is
    padded up to a chunk multiple with identity panels.  Default: the
    measured sweet spot (see :func:`panel_chunk_default`).
    """
    B, b, b2 = A.shape
    assert b == b2
    if chunk is None:
        chunk = panel_chunk_default(b)
    C = min(chunk, B)
    rem = (-B) % C
    if rem:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), (rem, b, b))
        A = jnp.concatenate([A, eye], axis=0)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _panel_kernel_batched,
            out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
            grid=(A.shape[0] // C,),
            in_specs=[
                pl.BlockSpec(
                    (C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(A)
    return out[:B]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ldl_panels(A: jax.Array, interpret: bool = False) -> jax.Array:
    """Factor a batch of symmetric panels: (B, b, b) -> packed (B, b, b).

    One grid step per panel; the panel stays in VMEM for the whole
    factorization loop.  Traced with x64 disabled: Mosaic cannot lower the
    int64 index types that jax_enable_x64 (which the package enables
    globally) would introduce.
    """
    B, b, b2 = A.shape
    assert b == b2
    with jax.enable_x64(False):
        return pl.pallas_call(
            _panel_kernel,
            out_shape=jax.ShapeDtypeStruct((B, b, b), A.dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (1, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(A)
