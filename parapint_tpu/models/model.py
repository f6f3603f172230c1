"""NLP model protocol.

Replaces the reference's modeling stack (Pyomo model -> .nl file -> ASL via
PyNumero, /root/reference/parapint/interfaces/interface.py:250-256) with a
minimal pure-function protocol: an NLP is

    min  f(x)
    s.t. c_eq(x) = 0
         gl <= c_ineq(x) <= gu
         xl <= x <= xu

where ``f``, ``c_eq`` and ``c_ineq`` are JAX-traceable functions.  All
derivative information (gradient, Jacobians, Hessian of the Lagrangian) is
obtained with JAX AD — there is no expression graph, no file format, no
separate AD library.
"""

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _as_f64(x) -> jax.Array:
    return jnp.asarray(x, dtype=jnp.float64)


@dataclasses.dataclass
class NLPModel:
    """A single NLP as pure functions + data.

    Parameters
    ----------
    objective: x -> scalar
    x0: (n,) initial primal values
    eq_constraints: x -> (n_eq,), residual form c(x) = 0 (may be None)
    ineq_constraints: x -> (n_ineq,), with bounds gl <= g(x) <= gu (may be None)
    xl, xu: (n,) variable bounds; default unbounded
    gl, gu: (n_ineq,) inequality bounds; required when ineq_constraints given
    y_eq0, y_ineq0: initial duals; default zeros (matching PyNumero's
        ``init_duals_eq``/``init_duals_ineq`` defaults)
    zl0, zu0: initial bound duals; default ones (reference
        interface.py:643-649: all-ones when no ipopt suffix warm start)
    """

    objective: Callable
    x0: object
    eq_constraints: Optional[Callable] = None
    ineq_constraints: Optional[Callable] = None
    xl: Optional[object] = None
    xu: Optional[object] = None
    gl: Optional[object] = None
    gu: Optional[object] = None
    y_eq0: Optional[object] = None
    y_ineq0: Optional[object] = None
    zl0: Optional[object] = None
    zu0: Optional[object] = None

    def __post_init__(self):
        self.x0 = _as_f64(self.x0)
        n = self.x0.shape[0]
        self.xl = _as_f64(self.xl) if self.xl is not None else jnp.full(n, -jnp.inf)
        self.xu = _as_f64(self.xu) if self.xu is not None else jnp.full(n, jnp.inf)
        if self.xl.shape != (n,) or self.xu.shape != (n,):
            raise ValueError("xl/xu must have the same shape as x0")

        # probe constraint dimensions by abstract evaluation (no flops)
        if self.eq_constraints is not None:
            eq_shape = jax.eval_shape(self.eq_constraints, self.x0)
            self.n_eq = int(np.prod(eq_shape.shape)) if eq_shape.shape else 1
        else:
            self.n_eq = 0
        if self.ineq_constraints is not None:
            ineq_shape = jax.eval_shape(self.ineq_constraints, self.x0)
            self.n_ineq = int(np.prod(ineq_shape.shape)) if ineq_shape.shape else 1
            if self.gl is None and self.gu is None:
                raise ValueError("gl and/or gu required with ineq_constraints")
            self.gl = (
                _as_f64(self.gl)
                if self.gl is not None
                else jnp.full(self.n_ineq, -jnp.inf)
            )
            self.gu = (
                _as_f64(self.gu)
                if self.gu is not None
                else jnp.full(self.n_ineq, jnp.inf)
            )
        else:
            self.n_ineq = 0
            self.gl = jnp.zeros(0)
            self.gu = jnp.zeros(0)

        self.n_x = n
        self.y_eq0 = (
            _as_f64(self.y_eq0) if self.y_eq0 is not None else jnp.zeros(self.n_eq)
        )
        self.y_ineq0 = (
            _as_f64(self.y_ineq0)
            if self.y_ineq0 is not None
            else jnp.zeros(self.n_ineq)
        )
        self.zl0 = _as_f64(self.zl0) if self.zl0 is not None else jnp.ones(n)
        self.zu0 = _as_f64(self.zu0) if self.zu0 is not None else jnp.ones(n)
