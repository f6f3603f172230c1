"""Explicit Schur-complement solver for block-bordered-diagonal KKT systems.

Solves the symmetric system (reference docstring,
/root/reference/parapint/linalg/schur_complement/explicit_schur_complement.py:17-27)::

    [ K_0            A_0^T ] [x_0]   [b_0]
    [      ...        ...  ] [...] = [...]
    [          K_N-1 A_N-1^T] [x_N-1] [b_N-1]
    [ A_0 ... A_N-1    Q   ] [y  ]   [b_c]

via S = Q - sum_i A_i K_i^{-1} A_i^T; factor each K_i and S; then
x_i = K_i^{-1}(b_i - A_i^T y) with y = S^{-1}(b_c - sum_i A_i K_i^{-1} b_i).

TPU-native design vs the reference:

- All diagonal blocks are factored in ONE batched LDL^T kernel
  (vs a Python loop of per-block factorizations,
  explicit_schur_complement.py:99-104).
- S is formed with one batched multi-right-hand-side triangular solve
  K_i^{-1} A_i^T followed by a batched matmul — strictly better than the
  reference's column-by-column back-solve loop over nonzero border rows
  (explicit_schur_complement.py:108-122); on TPU the multi-RHS solve and the
  A_i * V_i contraction both run on the MXU.
- Blocks are uniform (padded) so the whole solver is shape-static; a
  per-block ``mask`` marks padding blocks (used when the number of logical
  blocks does not fill the batch) which contribute identity factors and are
  excluded from the inertia.

The sharded (multi-chip) variant with identical math lives in
:mod:`parapint_tpu.linalg.sharded_schur`.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from parapint_tpu.linalg.base import LinearSolver
from parapint_tpu.linalg.dense import DenseLDLSolver
from parapint_tpu.linalg.results import LinearSolverResults, LinearSolverStatus
from parapint_tpu.ops.ldl import ldl_factor, ldl_inertia, ldl_solve


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockKKT:
    """Block-bordered-diagonal symmetric KKT system, dense uniform blocks.

    diag:   (N, nk, nk)  diagonal blocks K_i
    border: (N, nc, nk)  border blocks A_i (rows = coupling dimension)
    q:      (nc, nc)     coupling block Q
    mask:   (N,) float   1.0 for logical blocks, 0.0 for padding blocks
    """

    diag: jax.Array
    border: jax.Array
    q: jax.Array
    mask: jax.Array

    @staticmethod
    def make(diag, border, q, mask=None) -> "BlockKKT":
        if mask is None:
            mask = jnp.ones(diag.shape[0], dtype=diag.dtype)
        return BlockKKT(diag=diag, border=border, q=q, mask=mask)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockRhs:
    """Right-hand side / solution for a BlockKKT system.

    blocks:   (N, nk)
    coupling: (nc,)
    """

    blocks: jax.Array
    coupling: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SchurFactor:
    block_LD: jax.Array  # (N, npad, npad) packed per-block LDL factors
    border: jax.Array  # (N, nc, nk) saved for the back solve
    sc_fact: object  # factorization pytree of the SC sub-solver
    inertia: jax.Array  # (3,) int32, blocks + SC
    status: jax.Array  # () int32
    nk: int = dataclasses.field(metadata=dict(static=True))


def _factor_blocks(diag: jax.Array, mask: jax.Array, block_size: int, zero_tol: float):
    """Batched LDL^T of the diagonal blocks + per-block inertia/status."""
    nk = diag.shape[-1]
    bs = min(block_size, max(8, nk))
    LD, d = jax.vmap(lambda a: ldl_factor(a, block_size=bs))(diag)
    pos, neg, zero = jax.vmap(lambda dd: ldl_inertia(dd, n=nk, zero_tol=zero_tol))(d)
    ok = (pos + neg) == nk
    # padding blocks are identity: always ok, contribute nothing
    imask = mask.astype(jnp.int32)
    inertia = jnp.stack(
        [jnp.sum(pos * imask), jnp.sum(neg * imask), jnp.sum(zero * imask)]
    )
    any_bad = jnp.any(jnp.logical_and(jnp.logical_not(ok), mask > 0))
    status = jnp.where(
        any_bad,
        jnp.int32(LinearSolverStatus.singular),
        jnp.int32(LinearSolverStatus.successful),
    )
    return LD, inertia, status


def _sc_contribution(LD: jax.Array, border: jax.Array, mask: jax.Array):
    """sum_i A_i K_i^{-1} A_i^T over the (local) batch of blocks."""
    # V_i = K_i^{-1} A_i^T : batched multi-RHS solve, (N, nk, nc)
    V = jax.vmap(lambda ld, a: ldl_solve(ld, a.T))(LD, border)
    # contribution_i = A_i @ V_i ; masked sum over blocks (MXU contraction)
    return jnp.einsum(
        "bci,bik,b->ck", border, V, mask, preferred_element_type=border.dtype
    )


def _form_sc(LD: jax.Array, border: jax.Array, q: jax.Array, mask: jax.Array):
    """S = Q - sum_i A_i K_i^{-1} A_i^T, all blocks batched."""
    return q - _sc_contribution(LD, border, mask)


class SchurComplementSolver(LinearSolver):
    """Serial (single-device) Schur-complement solver.

    Composes the batched per-block LDL^T with any :class:`LinearSolver` for
    the Schur complement (the reference's dependency-injection seam,
    explicit_schur_complement.py:28-39).
    """

    def __init__(
        self,
        schur_complement_solver: Optional[LinearSolver] = None,
        block_size: int = 128,
        zero_tol: float = 1e-12,
    ):
        self.sc_solver = (
            schur_complement_solver
            if schur_complement_solver is not None
            else DenseLDLSolver(block_size=block_size, zero_tol=zero_tol)
        )
        self.block_size = block_size
        self.zero_tol = zero_tol

    def symbolic(self, kkt: BlockKKT) -> LinearSolverResults:
        N, nk, nk2 = kkt.diag.shape
        if nk != nk2:
            raise ValueError(f"diagonal blocks are not square: {kkt.diag.shape}")
        nc = kkt.q.shape[-1]
        if kkt.border.shape != (N, nc, nk):
            raise ValueError(
                f"border shape {kkt.border.shape} inconsistent with "
                f"diag {kkt.diag.shape} and q {kkt.q.shape}"
            )
        return LinearSolverResults(status=LinearSolverStatus.successful)

    def numeric(self, kkt: BlockKKT) -> SchurFactor:
        nk = kkt.diag.shape[-1]
        LD, blk_inertia, blk_status = _factor_blocks(
            kkt.diag, kkt.mask, self.block_size, self.zero_tol
        )
        sc = _form_sc(LD, kkt.border, kkt.q, kkt.mask)
        sc_fact = self.sc_solver.numeric(sc)
        sc_pos, sc_neg, sc_zero = self.sc_solver.inertia(sc_fact)
        inertia = blk_inertia + jnp.stack([sc_pos, sc_neg, sc_zero])
        status = jnp.maximum(blk_status, self.sc_solver.status(sc_fact))
        return SchurFactor(
            block_LD=LD,
            border=kkt.border,
            sc_fact=sc_fact,
            inertia=inertia,
            status=status,
            nk=nk,
        )

    def solve(self, fact: SchurFactor, rhs: BlockRhs) -> BlockRhs:
        nk = fact.nk
        # local block solves (reference back solve pass 1,
        # explicit_schur_complement.py:144-148)
        v = jax.vmap(lambda ld, b: ldl_solve(ld, b))(fact.block_LD, rhs.blocks)
        sc_rhs = rhs.coupling - jnp.einsum(
            "bci,bi->c", fact.border, v, preferred_element_type=v.dtype
        )
        y = self.sc_solver.solve(fact.sc_fact, sc_rhs)
        # second block pass with the coupling solution substituted
        rhs2 = rhs.blocks - jnp.einsum(
            "bci,c->bi", fact.border, y, preferred_element_type=v.dtype
        )
        x = jax.vmap(lambda ld, b: ldl_solve(ld, b))(fact.block_LD, rhs2)
        return BlockRhs(blocks=x[:, :nk], coupling=y)

    def inertia(self, fact: SchurFactor):
        return fact.inertia[0], fact.inertia[1], fact.inertia[2]

    def status(self, fact: SchurFactor) -> jax.Array:
        return fact.status
