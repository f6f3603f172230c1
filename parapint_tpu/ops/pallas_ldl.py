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


def _make_slab_kernel(b: int, r: int, with_w: bool, rank2: bool = False):
    """Two-level (slab-blocked) panel kernel factory.

    The per-column kernels above are LATENCY-bound: b serial rank-1 steps,
    each touching the full (C, b, b) chunk (round-3 profile: ~0.7 us/step,
    ~11 ms of a ~36 ms iteration with the MXU ~96% idle).  This kernel
    factors the panel in b/r slabs of ``r`` columns:

      * the r serial steps inside a slab touch only the (C, r, b) slab —
        r = 8 sublanes x b = 128 lanes = ONE vreg per chunk element, 16x
        less data per dependent step than the full-width rank-1;
      * the trailing update (columns past the slab) is ONE rank-r
        dot_general per slab (MXU), not r rank-1 VPU sweeps;
      * the W = L^{-1} accumulation becomes two rank-r matmuls per slab
        (W_slab <- L11^{-1} W_slab; W_after -= L21 W_slab) instead of a
        full-width (C, b, b) rank-1 per column.  L11^{-1} itself is NOT
        accumulated inside the serial loop (that cost 2-3 extra chained
        VPU ops per column step — the round-4 profile put the slab kernels
        at ~0.4-0.7 us per dependent op regardless of operand size);
        it is reconstructed AFTER the loop from the already-packed slab
        columns by Neumann doubling on the nilpotent strict-lower part:
        (I + N)^{-1} = I - N + N^2 - ... truncates exactly at r terms,
        so ceil(log2(r)) squaring rounds = ~3 tiny (C, r, r) MXU dots
        replace 2r chained in-loop ops.

    Layout: the kernel works on the TRANSPOSED matrix At = A^T (wrappers
    transpose in XLA), so a slab of columns is a SUBLANE slice (free) and
    every serial step reads the TRUE pivot column of A (the round-2 lesson:
    the factor must derive from the lower triangle only — the trailing
    block is only symmetric to ulp).  A small (C, r, r) copy ``Q`` of the
    slab's diagonal block is maintained in column-major layout so the
    in-slab rank-1 needs no per-step relayout; its updates use bitwise the
    same products as the slab update, so the two copies never drift.
    W stays in natural layout (its updates are row-slab matmuls).

    The working matrix lives IN the output ref (initialized from the input
    ref, then updated in place slab-by-slab), so Mosaic's live-value stack
    holds only one slab's intermediates — this is what lets the chunk C
    grow past the per-column kernels' measured cliff (chunk > 4 spilled the
    ~40-buffer live set; see winv_max_chunk).
    """
    nslab = b // r
    assert nslab * r == b

    def kernel(a_ref, out_ref, *w_refs):
        dt = a_ref.dtype
        lane_b = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
        subl_r = lax.broadcasted_iota(jnp.int32, (1, r, 1), 1)
        lane_r = lax.broadcasted_iota(jnp.int32, (1, 1, r), 2)
        subl_b = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
        eye_r = jnp.where(
            subl_r == lane_r, jnp.ones((), dt), jnp.zeros((), dt)
        )  # (1, r, r)
        out_ref[...] = a_ref[...]
        if with_w:
            (w_ref,) = w_refs
            eye_b = jnp.where(
                subl_b == lane_b, jnp.ones((), dt), jnp.zeros((), dt)
            )
            w_ref[...] = jnp.broadcast_to(eye_b, w_ref.shape)
        for k in range(nslab):
            j0 = k * r
            e = j0 + r
            S = out_ref[:, j0:e, :]  # (C, r, b): row jj = column j0+jj of A
            # column-major copy of the slab's diagonal block:
            # Q[c, ii, jj] = A[j0+ii, j0+jj]
            Q = jnp.swapaxes(S[:, :, j0:e], 1, 2)  # (C, r, r)
            if rank2:
                # rank-2 micro steps (round-5 candidate, docs/ROUND4.md
                # lead 2): eliminate TWO columns per dependent-chain step —
                # the big (C, r, b) slab updates run once per pair, halving
                # the count of full-slab ops on the serial chain.  The
                # second column's elimination quantities derive from the
                # first's IN REGISTERS (c2 = col2 - m*l1 etc.), using
                # bitwise the same products as two rank-1 steps would.
                for t in range(r // 2):
                    p = 2 * t
                    j1 = j0 + p
                    j2 = j1 + 1
                    c1 = S[:, p : p + 1, :]  # (C, 1, b) true column j1
                    d1 = Q[:, p : p + 1, p : p + 1]  # (C, 1, 1)
                    d1s = jnp.where(jnp.abs(d1) > 0, d1, jnp.ones_like(d1))
                    below1 = lane_b > jnp.int32(j1)
                    l1 = jnp.where(below1, c1 / d1s, jnp.zeros_like(c1))
                    packed1 = jnp.where(below1, l1, c1)
                    # column j2 after step 1's rank-1 (m = raw A[j2, j1]).
                    # l21 is SLICED from l1 (lane j2), not recomputed as
                    # m/d1 — keeps every product bitwise identical to two
                    # sequential rank-1 steps (a*(b/c) != (a/c)*b in fp)
                    m = Q[:, p + 1 : p + 2, p : p + 1]  # (C, 1, 1)
                    c2 = S[:, p + 1 : p + 2, :] - m * l1
                    l21 = l1[:, :, j2 : j2 + 1]  # (C, 1, 1)
                    d2 = Q[:, p + 1 : p + 2, p + 1 : p + 2] - m * l21
                    d2s = jnp.where(jnp.abs(d2) > 0, d2, jnp.ones_like(d2))
                    below2 = lane_b > jnp.int32(j2)
                    l2 = jnp.where(below2, c2 / d2s, jnp.zeros_like(c2))
                    packed2 = jnp.where(below2, l2, c2)
                    # rank-2 update of rows kk > p+1 (columns j0+kk of A):
                    # x1 = raw col p of Q, x2 = col p+1 updated by step 1
                    mask_r = subl_r > jnp.int32(p + 1)  # (1, r, 1)
                    x1 = jnp.where(mask_r, Q[:, :, p : p + 1], 0.0)
                    x2 = jnp.where(
                        mask_r,
                        Q[:, :, p + 1 : p + 2] - Q[:, :, p : p + 1] * l21,
                        0.0,
                    )
                    Snew = S - x1 * l1 - x2 * l2
                    S = jnp.where(
                        subl_r == jnp.int32(p),
                        packed1,
                        jnp.where(subl_r == jnp.int32(p + 1), packed2, Snew),
                    )
                    l1s = l1[:, :, j0:e]
                    l2s = l2[:, :, j0:e]
                    Q = Q - x1 * l1s - x2 * l2s
            else:
                for jj in range(r):
                    j = j0 + jj
                    colj = S[:, jj : jj + 1, :]  # (C, 1, b) true column j
                    piv = Q[:, jj : jj + 1, jj : jj + 1]  # (C, 1, 1)
                    piv_safe = jnp.where(
                        jnp.abs(piv) > 0, piv, jnp.ones_like(piv)
                    )
                    below = lane_b > jnp.int32(j)  # (1, 1, b)
                    l = jnp.where(below, colj / piv_safe, jnp.zeros_like(colj))
                    # in-slab rank-1 on rows kk > jj (columns j0+kk of A)
                    # fused with packing row jj: S[kk, i] -= x[kk] l[i]
                    xsub = jnp.where(
                        subl_r > jnp.int32(jj), Q[:, :, jj : jj + 1], 0.0
                    )  # (C, r, 1)
                    packed = jnp.where(below, l, colj)
                    S = jnp.where(subl_r == jnp.int32(jj), packed, S - xsub * l)
                    # Q mirrors the slab-lane part with bitwise identical
                    # products: Q[kk, m] -= x[kk] * l_slab[m]
                    Q = Q - xsub * l[:, :, j0:e]
            out_ref[:, j0:e, :] = S
            # masked L in both orientations.  ONE explicit (C,r,b)->(C,b,r)
            # transpose per slab buys NATIVE MXU dot layouts below
            # (contract LHS lanes with RHS sublanes); sublane-contracting
            # dot_generals would relayout both operands per dot.
            Lmask = lane_b > (jnp.int32(j0) + subl_r)  # (1, r, b)
            Ls = jnp.where(Lmask, S, jnp.zeros_like(S))  # L[i, jj] at [jj, i]
            Ln = jnp.swapaxes(Ls, 1, 2)  # (C, b, r): L[i, jj] at [i, jj]
            # pivots as a lane vector (C, 1, r): d_jj = S[jj, j0+jj]
            ds = jnp.sum(
                S[:, :, j0:e] * eye_r, axis=1, keepdims=True
            )  # (C, 1, r)
            if e < b:
                # trailing update, one rank-r native-layout MXU dot:
                # At[k, i] -= sum_jj (d_jj l_k) * l_i, k >= e
                Xn = Ln[:, e:, :] * ds  # (C, b-e, r)
                upd = lax.dot_general(
                    Xn,
                    Ls,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=dt,
                )  # (C, b - e, b)
                out_ref[:, e:, :] = out_ref[:, e:, :] - upd
            if with_w:
                # L11^{-1} by Neumann doubling on the packed slab columns
                # (NOT accumulated in the serial loop above — see the
                # factory docstring).  Ls[:, jj, j0+ii] = L11[ii, jj] for
                # ii > jj, so the natural-layout strict-lower part is one
                # tiny (C, r, r) transpose away.  With Nm = -strict(L11),
                # L11^{-1} = I + Nm + Nm^2 + ... truncating exactly at
                # Nm^{r-1} (nilpotent): double S <- S + P @ S, P <- P @ P.
                Nm = -jnp.swapaxes(Ls[:, :, j0:e], 1, 2)  # (C, r, r)
                L11inv = jnp.broadcast_to(eye_r, Nm.shape) + Nm
                P = Nm
                covered = 2  # L11inv holds sum over exponents < covered
                while covered < r:
                    P = lax.dot_general(
                        P, P, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=dt,
                    )
                    L11inv = L11inv + lax.dot_general(
                        P, L11inv, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=dt,
                    )
                    covered *= 2
                Ws = w_ref[:, j0:e, :]  # (C, r, b) rows j0..e of W
                Ws = lax.dot_general(
                    L11inv,
                    Ws,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=dt,
                )
                w_ref[:, j0:e, :] = Ws
                if e < b:
                    # W_after -= L21 @ Ws, L21 = Ln rows >= e (native layout)
                    wupd = lax.dot_general(
                        Ln[:, e:, :],
                        Ws,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=dt,
                    )  # (C, b - e, b)
                    w_ref[:, e:, :] = w_ref[:, e:, :] - wupd

    return kernel


def slab_chunk_default(b: int) -> int:
    """Chunk for the slab kernels.  Unlike the per-column kernels (whose
    live-value stack capped the chunk at 4 for b=128), the slab kernel keeps
    its working state in the output refs; the chunk is bounded by ref VMEM
    (3 * C * b^2 * 4 bytes) and the measured sweet spot (see
    docs/benchmarks.md round 4)."""
    return max(1, min(32, 4096 // b))


@functools.partial(
    jax.jit, static_argnames=("chunk", "interpret", "slab", "rank2")
)
def ldl_panels_slab(
    A: jax.Array,
    chunk: int | None = None,
    interpret: bool = False,
    slab: int = 8,
    rank2: bool = False,
) -> jax.Array:
    """Slab-blocked batched panel factorization: (B, b, b) -> packed.

    Same contract as :func:`ldl_panels_batched` (strict lower = L, diagonal
    = D), computed by the two-level kernel (see :func:`_make_slab_kernel`).
    Requires b % slab == 0.
    """
    B, b, b2 = A.shape
    assert b == b2 and b % slab == 0
    if chunk is None:
        chunk = slab_chunk_default(b)
    C = min(chunk, B)
    rem = (-B) % C
    if rem:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), (rem, b, b))
        A = jnp.concatenate([A, eye], axis=0)
    At = jnp.swapaxes(A, 1, 2)  # kernel works on true columns as sublanes
    with jax.enable_x64(False):
        out_t = pl.pallas_call(
            _make_slab_kernel(b, slab, with_w=False, rank2=rank2),
            out_shape=jax.ShapeDtypeStruct(At.shape, At.dtype),
            grid=(At.shape[0] // C,),
            in_specs=[
                pl.BlockSpec(
                    (C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (C, b, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(At)
    return jnp.swapaxes(out_t, 1, 2)[:B]


@functools.partial(
    jax.jit, static_argnames=("chunk", "interpret", "slab", "rank2")
)
def ldl_panels_slab_winv(
    A: jax.Array,
    chunk: int | None = None,
    interpret: bool = False,
    slab: int = 8,
    rank2: bool = False,
):
    """Slab-blocked batched panel factorization + panel inverse W = L^{-1}.

    Same contract as :func:`ldl_panels_batched_winv`; W is produced by
    rank-``slab`` matmuls instead of per-column full-width rank-1s, which
    removes the scoped-VMEM chunk cliff (winv_max_chunk) entirely.
    """
    B, b, b2 = A.shape
    assert b == b2 and b % slab == 0
    if chunk is None:
        chunk = slab_chunk_default(b)
    C = min(chunk, B)
    rem = (-B) % C
    if rem:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), (rem, b, b))
        A = jnp.concatenate([A, eye], axis=0)
    At = jnp.swapaxes(A, 1, 2)
    with jax.enable_x64(False):
        out_t, w = pl.pallas_call(
            _make_slab_kernel(b, slab, with_w=True, rank2=rank2),
            out_shape=(
                jax.ShapeDtypeStruct(At.shape, At.dtype),
                jax.ShapeDtypeStruct(At.shape, At.dtype),
            ),
            grid=(At.shape[0] // C,),
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
        )(At)
    return jnp.swapaxes(out_t, 1, 2)[:B], w[:B]


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
    explicit_chunk = chunk is not None
    if chunk is None:
        chunk = panel_chunk_default(b)
    if not interpret:
        cap = winv_max_chunk(b)
        if cap < 1:
            # even chunk=1 exceeds the measured scoped-VMEM stack: the
            # kernel cannot compile at this panel size (b > ~153).  Callers
            # that can fall back (ops/ldl.py) gate on winv_max_chunk >= 1;
            # a direct call must not silently produce the compile failure.
            raise ValueError(
                f"panel size b={b} exceeds the winv kernel's scoped-VMEM "
                f"budget even at chunk=1 (winv_max_chunk(b)=0); use "
                f"ldl_factor_winv_batched's XLA fallback or b <= 128"
            )
        if chunk > cap:
            if explicit_chunk:
                import warnings

                warnings.warn(
                    f"ldl_panels_batched_winv: requested chunk={chunk} "
                    f"exceeds the scoped-VMEM budget at b={b}; clamping to "
                    f"{cap}",
                    stacklevel=2,
                )
            chunk = cap
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
