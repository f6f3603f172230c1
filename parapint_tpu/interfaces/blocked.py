"""Shared machinery for block-structured interfaces (dynamic & stochastic).

The reference builds one Pyomo/PyNumero NLP object per time block / scenario
and loops over them
(/root/reference/parapint/interfaces/schur_complement/sc_ip_interface.py:143-177);
here all blocks are one *uniform batched family*: the user provides block
functions ``f(x, p)``, ``c_eq(x, p)``, ``c_ineq(x, p)`` shared across blocks
plus per-block parameters ``p`` (a pytree with leading dimension N), and all
evaluation/AD is ``vmap``-ed over the block axis — one XLA computation for
every block instead of N Python loops.

Block-shape raggedness (e.g. initial conditions existing only in time block
0, reference sc_ip_interface.py:154-160) is handled by *row masks*: the
evaluated constraints are multiplied by a per-block 0/1 mask, which zeroes
the residual AND (through AD) the Jacobian row; the KKT assembly then gives
masked rows a decoupled -1 diagonal so they contribute exactly one negative
eigenvalue each and a zero delta.  The same trick with +1 diagonals pads
variables (``x_mask``).
"""

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parapint_tpu.interfaces import base


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockKKTData:
    """Batched per-block evaluation results (one leading N axis each)."""

    hess: jax.Array  # (N, n, n)
    jac_eq: jax.Array  # (N, me, n)
    jac_ineq: jax.Array  # (N, mi, n)
    sigma_x: jax.Array  # (N, n)
    sigma_s: jax.Array  # (N, mi)


class BatchedNLPFunctions:
    """Masked, vmapped AD over a uniform family of blocks."""

    def __init__(
        self,
        objective: Callable,  # (x, p) -> scalar
        eq_constraints: Optional[Callable],  # (x, p) -> (me,)
        ineq_constraints: Optional[Callable],  # (x, p) -> (mi,)
        n_x: int,
        n_eq: int,
        n_ineq: int,
    ):
        self.n_x = n_x
        self.n_eq = n_eq
        self.n_ineq = n_ineq

        def _f(x, p, xm):
            return objective(jnp.where(xm, x, 0.0), p)

        def _ceq(x, p, xm, em):
            if n_eq == 0:
                return jnp.zeros(0, dtype=x.dtype)
            return em * eq_constraints(jnp.where(xm, x, 0.0), p)

        def _cineq(x, p, xm, im):
            if n_ineq == 0:
                return jnp.zeros(0, dtype=x.dtype)
            return im * ineq_constraints(jnp.where(xm, x, 0.0), p)

        self._f = _f
        self._ceq = _ceq
        self._cineq = _cineq

        # batched closures (block axis = axis 0 of every arg)
        self.f = jax.vmap(_f)
        self.total_objective = lambda xs, ps, xms: jnp.sum(self.f(xs, ps, xms))
        self.grad_f = jax.vmap(jax.grad(_f, argnums=0))
        self.c_eq = jax.vmap(_ceq)
        self.c_ineq = jax.vmap(_cineq)
        jac = jax.jacfwd if n_x <= max(n_eq, 1) else jax.jacrev
        self.jac_eq = jax.vmap(
            jac(_ceq, argnums=0)
            if n_eq
            else (lambda x, p, xm, em: jnp.zeros((0, n_x), dtype=x.dtype))
        )
        jaci = jax.jacfwd if n_x <= max(n_ineq, 1) else jax.jacrev
        self.jac_ineq = jax.vmap(
            jaci(_cineq, argnums=0)
            if n_ineq
            else (lambda x, p, xm, im: jnp.zeros((0, n_x), dtype=x.dtype))
        )

        def _lag(x, y_eq, y_ineq, obj_factor, p, xm, em, im):
            val = obj_factor * _f(x, p, xm)
            if n_eq:
                val = val + jnp.dot(y_eq, _ceq(x, p, xm, em))
            if n_ineq:
                val = val + jnp.dot(y_ineq, _cineq(x, p, xm, im))
            return val

        self.hess_lag = jax.vmap(jax.jacfwd(jax.grad(_lag, argnums=0), argnums=0))

        # -- banded-mode probing closures (matrix-free KKT matvecs) --------
        # each is batched over blocks (axis 0 of the state args) AND over a
        # shared set of probe vectors (axis 0 of v); used by the banded
        # per-block KKT assembly (structured.py) to recover the banded
        # Hessian/Jacobian blocks from 2p+1 matvecs instead of
        # materializing (N, n, n) Hessians — the matrix-free analogue of
        # the reference's sparse AD through ASL (interface.py:474-491)
        # model functions may mix dtypes internally (f64 module constants
        # under a kkt_dtype=f32 interface); pin every probed closure's
        # output to x's dtype so jvp/vjp tangent dtypes line up
        def _hvp(x, y_eq, y_ineq, obj_factor, p, xm, em, im, v):
            def g(xx):
                return jax.grad(
                    lambda xq: _lag(
                        xq, y_eq, y_ineq, obj_factor, p, xm, em, im
                    ).astype(xq.dtype),
                    argnums=0,
                )(xx).astype(xx.dtype)

            return jax.jvp(g, (x,), (v,))[1]

        probe = lambda f, nstate: jax.vmap(
            jax.vmap(f, in_axes=(None,) * nstate + (0,)),
            in_axes=(0,) * nstate + (None,),
        )
        self.hvp_lag = probe(_hvp, 8)

        def _jvp_eq(x, p, xm, em, v):
            if not n_eq:
                return jnp.zeros(0, dtype=x.dtype)
            f = lambda xx: _ceq(xx, p, xm, em).astype(x.dtype)
            return jax.jvp(f, (x,), (v,))[1]

        def _vjp_eq(x, p, xm, em, w):
            if not n_eq:
                return jnp.zeros(n_x, dtype=x.dtype)
            f = lambda xx: _ceq(xx, p, xm, em).astype(x.dtype)
            return jax.vjp(f, x)[1](w)[0]

        def _jvp_ineq(x, p, xm, im, v):
            if not n_ineq:
                return jnp.zeros(0, dtype=x.dtype)
            f = lambda xx: _cineq(xx, p, xm, im).astype(x.dtype)
            return jax.jvp(f, (x,), (v,))[1]

        def _vjp_ineq(x, p, xm, im, w):
            if not n_ineq:
                return jnp.zeros(n_x, dtype=x.dtype)
            f = lambda xx: _cineq(xx, p, xm, im).astype(x.dtype)
            return jax.vjp(f, x)[1](w)[0]

        self.jvp_eq = probe(_jvp_eq, 4)
        self.vjp_eq = probe(_vjp_eq, 4)
        self.jvp_ineq = probe(_jvp_ineq, 4)
        self.vjp_ineq = probe(_vjp_ineq, 4)

        def _jtprod(x, y_eq, y_ineq, p, xm, em, im):
            """J_eq^T y_eq + J_ineq^T y_ineq via ONE reverse sweep.

            The dual contraction of the Lagrangian gradient needs only this
            product, never the materialized Jacobians — a VJP costs about
            one constraint evaluation, while jacfwd costs ~n_x of them.
            Lets the mixed-precision interface materialize J in f32 (for
            the KKT matrix) while the f64 rhs/convergence path stays exact.
            """

            def val(xx):
                out = jnp.zeros((), dtype=x.dtype)
                if n_eq:
                    out = out + jnp.dot(y_eq, _ceq(xx, p, xm, em))
                if n_ineq:
                    out = out + jnp.dot(y_ineq, _cineq(xx, p, xm, im))
                return out

            return jax.grad(val)(x)

        self.jtprod = jax.vmap(_jtprod)


def sub_kkt_layout(n: int, me: int, mi: int, n_link: int):
    """Offsets of the per-block variable families [x, s, y_eq, y_ineq, lam].

    Matches the reference's per-block ordering (x, s, y_eq, y_ineq from
    interface.py:474-491 with the link-dual rows appended as the second
    block row of the 2x2 sub-kkt, sc_ip_interface.py:277-307).
    """
    off_x = 0
    off_s = n
    off_yeq = n + mi
    off_yineq = n + mi + me
    off_lam = n + 2 * mi + me
    nk = off_lam + n_link
    return off_x, off_s, off_yeq, off_yineq, off_lam, nk


def assemble_block_diag(
    data: BlockKKTData,
    eq_mask: jax.Array,  # (N, me)
    ineq_mask: jax.Array,  # (N, mi)
    x_mask: jax.Array,  # (N, n)
    link_rows: jax.Array,  # (N, n_link, n): selector rows (masked)
    link_mask: jax.Array,  # (N, n_link)
    w_reg,
    c_reg,
) -> jax.Array:
    """Batched dense diagonal blocks [K_b, B_b^T; B_b, -c_reg I].

    Masked rows/vars get decoupled +-1 diagonals (see module docstring).
    Regularization semantics match the reference: ``w_reg`` adds to the
    real-variable Hessian diagonal, ``c_reg`` *sets* the real constraint
    diagonals to -c_reg (interface.py:590-619, sc_ip_interface.py:903-933).
    """
    N, n = data.sigma_x.shape
    me = data.jac_eq.shape[1]
    mi = data.jac_ineq.shape[1]
    n_link = link_rows.shape[1]
    off_x, off_s, off_yeq, off_yineq, off_lam, nk = sub_kkt_layout(n, me, mi, n_link)
    dt = data.hess.dtype
    # everything below must stay in dt (a mixed-precision interface hands
    # f32 data while regs/link rows arrive f64; any promotion would silently
    # rebuild the whole (N, nk, nk) result in f64)
    w_reg = jnp.asarray(w_reg, dtype=dt)
    c_reg = jnp.asarray(c_reg, dtype=dt)
    link_rows = link_rows.astype(dt)

    def one(hess, jeq, jineq, sx, ss, em, im, xm, lr, lm):
        # Build K as ONE concatenation of block rows (layout
        # [x, s, y_eq, y_ineq, lam]) instead of ~12 sequential .at[].set()
        # scatters into a zero matrix: the sets materialize as repeated
        # full-matrix dynamic-update-slices (O(nk^2) HBM traffic each),
        # while the concatenate is a single fused write of the result.
        hblk = hess + jnp.diag(jnp.where(xm, sx + w_reg, 1.0))
        s_coupling = -jnp.diag(im.astype(dt))
        z = lambda r, c: jnp.zeros((r, c), dtype=dt)
        row_x = [hblk, z(n, mi), jeq.T, jineq.T]
        row_s = [z(mi, n), jnp.diag(jnp.where(im, ss, 1.0)), z(mi, me), s_coupling]
        row_yeq = [jeq, z(me, mi), jnp.diag(jnp.where(em, -c_reg, -1.0)), z(me, mi)]
        row_yineq = [jineq, s_coupling, z(mi, me), jnp.diag(jnp.where(im, -c_reg, -1.0))]
        rows = [row_x, row_s, row_yeq, row_yineq]
        if n_link:
            row_x.append(lr.T)
            row_s.append(z(mi, n_link))
            row_yeq.append(z(me, n_link))
            row_yineq.append(z(mi, n_link))
            rows.append(
                [lr, z(n_link, mi), z(n_link, me), z(n_link, mi),
                 jnp.diag(jnp.where(lm, -c_reg, -1.0))]
            )
        return jnp.concatenate(
            [jnp.concatenate(r, axis=1) for r in rows], axis=0
        )

    return jax.vmap(one)(
        data.hess,
        data.jac_eq,
        data.jac_ineq,
        data.sigma_x,
        data.sigma_s,
        eq_mask,
        ineq_mask,
        x_mask,
        link_rows,
        link_mask,
    )


def selector_rows(sel_idx: np.ndarray, mask: np.ndarray, n: int) -> np.ndarray:
    """(N, L, n) 0/1 selector matrices: row j of block b has mask[b, j] at
    column sel_idx[j] (the reference's link COO matrices,
    sc_ip_interface.py:359-475, as dense batched selectors)."""
    N, L = mask.shape
    rows = np.zeros((N, L, n))
    for j in range(L):
        rows[:, j, sel_idx[j]] = mask[:, j]
    return rows
