"""Unit tests: structured SC assembly modes vs the generic scatter."""

import numpy as np
import jax.numpy as jnp

from parapint_tpu.linalg.schur import _assemble_sc, _scatter_sc


def chain_row_idx(N, ns):
    ncv = ns * (N - 1)
    row_idx = np.full((N, 2 * ns), ncv, dtype=np.int32)
    for i in range(N):
        if i > 0:
            row_idx[i, :ns] = (i - 1) * ns + np.arange(ns)
        if i < N - 1:
            row_idx[i, ns:] = i * ns + np.arange(ns)
    return row_idx


def symmetric_tiles(rng, N, L):
    S = rng.standard_normal((N, L, L))
    return (S + np.swapaxes(S, 1, 2)) / 2


def test_chain_matches_scatter():
    rng = np.random.default_rng(0)
    for N, ns in [(2, 1), (4, 3), (6, 5)]:
        ncv = ns * (N - 1)
        S_loc = symmetric_tiles(rng, N, 2 * ns)
        # zero the masked quadrant rows/cols exactly as the link masks do
        S_loc[0, :ns, :] = 0.0
        S_loc[0, :, :ns] = 0.0
        S_loc[N - 1, ns:, :] = 0.0
        S_loc[N - 1, :, ns:] = 0.0
        row_idx = chain_row_idx(N, ns)
        a = np.asarray(
            _scatter_sc(jnp.asarray(S_loc), jnp.asarray(row_idx), ncv)
        )
        b = np.asarray(
            _assemble_sc(jnp.asarray(S_loc), jnp.asarray(row_idx), ncv, "chain")
        )
        assert np.allclose(a, b, atol=1e-12), (N, ns, np.abs(a - b).max())


def test_chain_with_group_offset():
    """Sharded placement: assembling each contiguous chunk with its offset
    and summing must equal the whole-batch assembly."""
    rng = np.random.default_rng(1)
    N, ns = 4, 2
    ncv = ns * (N - 1)
    S_loc = symmetric_tiles(rng, N, 2 * ns)
    S_loc[0, :ns, :] = 0.0
    S_loc[0, :, :ns] = 0.0
    S_loc[N - 1, ns:, :] = 0.0
    S_loc[N - 1, :, ns:] = 0.0
    row_idx = chain_row_idx(N, ns)
    full = np.asarray(
        _assemble_sc(jnp.asarray(S_loc), jnp.asarray(row_idx), ncv, "chain")
    )
    parts = np.zeros_like(full)
    for shard in range(2):  # two shards of 2 blocks each
        sl = slice(2 * shard, 2 * shard + 2)
        parts += np.asarray(
            _assemble_sc(
                jnp.asarray(S_loc[sl]),
                jnp.asarray(row_idx[sl]),
                ncv,
                "chain",
                group_offset=jnp.int32(2 * shard),
            )
        )
    assert np.allclose(parts, full, atol=1e-12)


def test_shared_matches_scatter():
    rng = np.random.default_rng(2)
    N, L = 5, 4
    S_loc = symmetric_tiles(rng, N, L)
    row_idx = np.broadcast_to(np.arange(L, dtype=np.int32), (N, L)).copy()
    a = np.asarray(_scatter_sc(jnp.asarray(S_loc), jnp.asarray(row_idx), L))
    b = np.asarray(_assemble_sc(jnp.asarray(S_loc), jnp.asarray(row_idx), L, "shared"))
    assert np.allclose(a, b, atol=1e-12)
