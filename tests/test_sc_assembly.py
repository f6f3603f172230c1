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


def _chain_border_setup(N=5, ns=3, nk=7, seed=3):
    """Chain border_loc with zeroed out-of-range link rows + its row_idx."""
    rng = np.random.default_rng(seed)
    border_loc = rng.normal(size=(N, 2 * ns, nk))
    border_loc[0, :ns] = 0.0  # block 0 has no backward link
    border_loc[N - 1, ns:] = 0.0  # last block has no forward link
    row_idx = chain_row_idx(N, ns)
    ncv = (N - 1) * ns
    return border_loc, row_idx, ncv


def test_chain_border_apply_matches_scatter():
    from parapint_tpu.linalg.schur import (
        _border_apply_chain,
        _border_apply_local,
        _border_T_apply_chain,
        _border_T_apply_local,
    )

    N, ns, nk = 5, 3, 7
    border_loc, row_idx, ncv = _chain_border_setup(N, ns, nk)
    rng = np.random.default_rng(7)
    v = rng.normal(size=(N, nk))
    y = rng.normal(size=ncv)

    a = np.asarray(
        _border_apply_local(
            jnp.asarray(border_loc), jnp.asarray(row_idx), jnp.asarray(v), ncv
        )
    )
    b = np.asarray(
        _border_apply_chain(jnp.asarray(border_loc), jnp.asarray(v), ncv)
    )
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)

    at = np.asarray(
        _border_T_apply_local(
            jnp.asarray(border_loc), jnp.asarray(row_idx), jnp.asarray(y)
        )
    )
    bt = np.asarray(
        _border_T_apply_chain(jnp.asarray(border_loc), jnp.asarray(y))
    )
    np.testing.assert_allclose(at, bt, rtol=1e-12, atol=1e-12)


def test_chain_border_apply_sharded_offsets():
    """Shard-local chain border application with group offsets sums to the
    full-problem result (the psum the sharded solver performs)."""
    from parapint_tpu.linalg.schur import (
        _border_apply_chain,
        _border_apply_local,
        _border_T_apply_chain,
        _border_T_apply_local,
    )

    N, ns, nk, shards = 6, 2, 5, 2
    border_loc, row_idx, ncv = _chain_border_setup(N, ns, nk, seed=11)
    rng = np.random.default_rng(13)
    v = rng.normal(size=(N, nk))
    y = rng.normal(size=ncv)
    nb = N // shards

    full = np.asarray(
        _border_apply_local(
            jnp.asarray(border_loc), jnp.asarray(row_idx), jnp.asarray(v), ncv
        )
    )
    acc = np.zeros(ncv)
    parts_T = []
    for s in range(shards):
        sl = slice(s * nb, (s + 1) * nb)
        acc += np.asarray(
            _border_apply_chain(
                jnp.asarray(border_loc[sl]), jnp.asarray(v[sl]), ncv,
                group_offset=jnp.asarray(s * nb),
            )
        )
        parts_T.append(
            np.asarray(
                _border_T_apply_chain(
                    jnp.asarray(border_loc[sl]), jnp.asarray(y),
                    group_offset=jnp.asarray(s * nb),
                )
            )
        )
    np.testing.assert_allclose(full, acc, rtol=1e-12, atol=1e-12)

    full_T = np.asarray(
        _border_T_apply_local(
            jnp.asarray(border_loc), jnp.asarray(row_idx), jnp.asarray(y)
        )
    )
    np.testing.assert_allclose(
        full_T, np.concatenate(parts_T, axis=0), rtol=1e-12, atol=1e-12
    )
