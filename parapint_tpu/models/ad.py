"""JAX AD closures for an NLPModel.

This module is the functional replacement for the reference's
PyNumero/ASL evaluation surface (``evaluate_grad_objective``,
``evaluate_jacobian_eq/ineq``, ``evaluate_hessian_lag``;
/root/reference/parapint/interfaces/interface.py:432-588): every quantity is
a pure traced function of (x, duals, obj_factor), dense, and fuses into the
surrounding jit.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _empty_fn(x):
    return jnp.zeros(0, dtype=x.dtype)


class NLPFunctions:
    """Derivative closures for one NLP (or one block of a structured NLP).

    Parameters
    ----------
    objective, eq_constraints, ineq_constraints: pure functions of x
        (constraints may be None for empty families).
    n_x, n_eq, n_ineq: dimensions (static).

    Jacobians use forward- or reverse-mode per the row/column aspect ratio;
    the Hessian of the Lagrangian is forward-over-reverse.
    """

    def __init__(
        self,
        objective: Callable,
        eq_constraints: Optional[Callable],
        ineq_constraints: Optional[Callable],
        n_x: int,
        n_eq: int,
        n_ineq: int,
    ):
        self.n_x = n_x
        self.n_eq = n_eq
        self.n_ineq = n_ineq
        self.f = objective
        self.c_eq = eq_constraints if eq_constraints is not None else _empty_fn
        self.c_ineq = ineq_constraints if ineq_constraints is not None else _empty_fn

        self.grad_f = jax.grad(self.f)

        def _jac(fn, m):
            if m == 0:
                return lambda x: jnp.zeros((0, n_x))
            # jacfwd: n_x JVP passes; jacrev: m VJP passes
            return jax.jacfwd(fn) if n_x <= m else jax.jacrev(fn)

        self.jac_eq = _jac(self.c_eq, n_eq)
        self.jac_ineq = _jac(self.c_ineq, n_ineq)

        def lagrangian(x, y_eq, y_ineq, obj_factor):
            val = obj_factor * self.f(x)
            if n_eq:
                val = val + jnp.dot(y_eq, self.c_eq(x))
            if n_ineq:
                val = val + jnp.dot(y_ineq, self.c_ineq(x))
            return val

        # forward-over-reverse Hessian of the Lagrangian wrt x
        self.hess_lag = jax.jacfwd(jax.grad(lagrangian, argnums=0), argnums=0)

    @classmethod
    def from_model(cls, model) -> "NLPFunctions":
        return cls(
            objective=model.objective,
            eq_constraints=model.eq_constraints,
            ineq_constraints=model.ineq_constraints,
            n_x=model.n_x,
            n_eq=model.n_eq,
            n_ineq=model.n_ineq,
        )
