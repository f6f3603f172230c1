"""Banded-matrix kernels: the structured per-block factorization path.

The reference's perf harness factors *sparse* blocks of ~600k variables with
MA27 (multifrontal) — per-block KKTs built from banded matrices
(/root/reference/parapint/examples/performance/schur_complement/create_model.py:23-47,
utils.py:24-31, defaults n_q_per_block=5000, n_y_multiplier=120 in
main.py:63-73).  A dense batched factorization cannot touch that scale
(nk^2 memory).  The TPU-native answer is not a general sparse multifrontal
code (pointer-chasing elimination trees are hostile to the MXU); it is to
exploit the *structure*: banded operators stay banded, and a symmetric
banded matrix with half-bandwidth p tiled into ts x ts tiles (ts >= p) IS a
block-tridiagonal matrix — which :mod:`parapint_tpu.linalg.tridiag` already
factors by batched cyclic reduction.

Representation: a banded matrix B (n x n) with bands d in [-p, p] is stored
row-indexed as ``bands[d + p, i] = B[i, i + d]`` (zero where the column
falls outside [0, n)).  A symmetric matrix stores only d in [0, p]
(``sym_bands[e, i] = G[i + e, i]``, the lower bands).

Everything here is O(n * p^2) elementwise work — shape-static, vmap-able
over a leading block axis, and trivially fused by XLA.
"""

import jax
import jax.numpy as jnp


def banded_matvec(bands: jax.Array, x: jax.Array) -> jax.Array:
    """B @ x for a row-indexed banded matrix.

    bands: (2p+1, n) with bands[d+p, i] = B[i, i+d];  x: (n,) or (n, k).
    """
    nb, n = bands.shape
    p = (nb - 1) // 2
    vec = x.ndim == 1
    if vec:
        x = x[:, None]
    out = jnp.zeros_like(x)
    for d in range(-p, p + 1):
        # y[i] += B[i, i+d] * x[i+d]
        xs = jnp.roll(x, -d, axis=0)
        ids = jnp.arange(n) + d
        valid = ((ids >= 0) & (ids < n))[:, None]
        out = out + jnp.where(valid, bands[d + p][:, None] * xs, 0.0)
    return out[:, 0] if vec else out


def banded_rmatvec(bands: jax.Array, y: jax.Array) -> jax.Array:
    """B.T @ y for a row-indexed banded matrix; y: (n,) or (n, k)."""
    nb, n = bands.shape
    p = (nb - 1) // 2
    vec = y.ndim == 1
    if vec:
        y = y[:, None]
    out = jnp.zeros_like(y)
    for d in range(-p, p + 1):
        # (B^T y)[j] += B[j-d... ] : (B^T y)[i+d] += B[i, i+d] * y[i]
        contrib = bands[d + p][:, None] * y
        ids = jnp.arange(n) + d
        valid = ((ids >= 0) & (ids < n))[:, None]
        out = out + jnp.roll(jnp.where(valid, contrib, 0.0), d, axis=0)
    return out[:, 0] if vec else out


def banded_btb(bands: jax.Array) -> jax.Array:
    """Lower bands of B^T B for a row-indexed banded B.

    bands: (2p+1, n) -> sym_bands (2p+1, n) with
    sym_bands[e, i] = (B^T B)[i+e, i], e in [0, 2p].

    (B^T B)[i+e, i] = sum_d B[i-d, i] B[i-d, i+e]
                    = sum_d bands[d+p, i-d] * bands[d+e+p, i-d],
    a (2p+1)^2-term elementwise stencil.
    """
    nb, n = bands.shape
    p = (nb - 1) // 2
    ids = jnp.arange(n)
    out = jnp.zeros((2 * p + 1, n), dtype=bands.dtype)
    for e in range(0, 2 * p + 1):
        acc = jnp.zeros(n, dtype=bands.dtype)
        for d in range(-p, p + 1):
            if not (-p <= d + e <= p):
                continue
            # row r = i - d must be in range; shift both factors by -d
            a = jnp.roll(bands[d + p], d)
            b = jnp.roll(bands[d + e + p], d)
            valid = ((ids - d >= 0) & (ids - d < n))
            acc = acc + jnp.where(valid, a * b, 0.0)
        # column i + e must be in range for the symmetric store
        acc = jnp.where(ids + e < n, acc, 0.0)
        out = out.at[e].set(acc)
    return out


def sym_banded_matvec(sym_bands: jax.Array, x: jax.Array) -> jax.Array:
    """G @ x for a symmetric banded matrix stored as lower bands.

    sym_bands: (p+1, n) with sym_bands[e, i] = G[i+e, i]; x: (n,) or (n, k).
    An O(n * p) stencil — the refinement matvec of the banded per-block
    factorization path (no dense (n, n) operand ever exists).
    """
    pp1, n = sym_bands.shape
    p = pp1 - 1
    vec = x.ndim == 1
    if vec:
        x = x[:, None]
    ids = jnp.arange(n)
    out = sym_bands[0][:, None] * x
    for e in range(1, p + 1):
        band = sym_bands[e][:, None]  # G[i+e, i]
        # lower part: y[i+e] += G[i+e, i] x[i]  ->  y[j] += band[j-e] x[j-e]
        valid_lo = (ids >= e)[:, None]
        out = out + jnp.where(valid_lo, jnp.roll(band * x, e, axis=0), 0.0)
        # upper part: y[i] += G[i+e, i] x[i+e]
        valid_hi = (ids + e < n)[:, None]
        out = out + jnp.where(valid_hi, band * jnp.roll(x, -e, axis=0), 0.0)
    return out[:, 0] if vec else out


def sym_band_to_tridiag_tiles(sym_bands: jax.Array, ts: int):
    """Tile a symmetric banded matrix (half-bandwidth p <= ts) into
    block-tridiagonal ts x ts tiles.

    sym_bands: (p+1, n) lower bands; n must be a multiple of ts (pad the
    matrix with identity rows first if needed — see :func:`pad_sym_band`).

    Returns (diag_tiles (m, ts, ts), upper_tiles (m-1, ts, ts)) suitable for
    :class:`parapint_tpu.linalg.tridiag.BlockTridiag`.
    """
    pp1, n = sym_bands.shape
    p = pp1 - 1
    if p > ts:
        raise ValueError(f"half-bandwidth {p} exceeds tile size {ts}")
    if n % ts != 0:
        raise ValueError(f"n={n} not a multiple of tile size {ts}")
    m = n // ts
    dt = sym_bands.dtype
    diag = jnp.zeros((m, ts, ts), dtype=dt)
    upper = jnp.zeros((max(m - 1, 0), ts, ts), dtype=dt)
    band_t = sym_bands.reshape(pp1, m, ts)  # [e, g, b] = G[g*ts+b+e, g*ts+b]
    b_ids = jnp.arange(ts)
    for e in range(0, p + 1):
        v = band_t[e]  # (m, ts): G[g*ts + b + e, g*ts + b]
        # within-tile part: rows a = b + e < ts -> diag tile (a, b) and (b, a)
        in_tile = b_ids + e < ts
        vals = jnp.where(in_tile[None, :], v, 0.0)
        rows = jnp.where(in_tile, b_ids + e, 0)
        diag = diag.at[:, rows, b_ids].add(jnp.where(in_tile[None, :], vals, 0.0))
        if e > 0:
            diag = diag.at[:, b_ids, rows].add(
                jnp.where(in_tile[None, :], vals, 0.0)
            )
        if e > 0 and m > 1:
            # tile-crossing part: row lands in tile g+1: a' = b + e - ts >= 0.
            # G[(g+1)ts + a', g ts + b] is the SUBdiagonal tile = upper^T:
            # upper_tiles[g][b, a'] (row = within tile g, col = within g+1).
            cross = b_ids + e >= ts
            vals = jnp.where(cross[None, :], v[:-1], 0.0)
            cols = jnp.where(cross, b_ids + e - ts, 0)
            upper = upper.at[:, b_ids, cols].add(vals)
    return diag, upper


def pad_sym_band(sym_bands: jax.Array, ts: int):
    """Pad a symmetric band store so n becomes a multiple of ts; padded
    rows are identity (+1 pivots, decoupled).  Returns (padded, n_pad)."""
    pp1, n = sym_bands.shape
    rem = (-n) % ts
    if rem == 0:
        return sym_bands, 0
    pad = jnp.zeros((pp1, rem), dtype=sym_bands.dtype)
    pad = pad.at[0].set(1.0)
    return jnp.concatenate([sym_bands, pad], axis=1), rem
