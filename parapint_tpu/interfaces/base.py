"""Shared state containers and elementwise interior-point math.

Transcribes the barrier/bound semantics of the reference
(/root/reference/parapint/interfaces/interface.py and
/root/reference/parapint/algorithms/interior_point.py helper functions) as
pure vectorized functions shared by all interfaces.  Padded entries follow
the invariant: padded bounds are +-inf, padded duals are exactly 0, padded
residuals/gradients are exactly 0 — so every formula below is
padding-oblivious.
"""

import abc
import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IPState:
    """The eight iterate families of the primal-dual IP method
    (reference interior_point.py:433-440).  Each field is an array for the
    single-NLP interface, or a nested pytree for structured interfaces.
    """

    primals: Any
    slacks: Any
    duals_eq: Any
    duals_ineq: Any
    duals_primals_lb: Any
    duals_primals_ub: Any
    duals_slacks_lb: Any
    duals_slacks_ub: Any


class BaseInteriorPointInterface(abc.ABC):
    """The interface contract :func:`parapint_tpu.algorithms.ip_solve`
    programs against.

    The functional redesign of the reference's 50-method stateful ABC
    (/root/reference/parapint/interfaces/interface.py:9-247): state is an
    :class:`IPState` pytree passed through pure traceable methods, so the
    whole iteration can fuse into one XLA computation
    (:func:`parapint_tpu.algorithms.ip_solve_fused`).  Mapping to the
    reference's surface:

    - the init_*/set_*/get_* family        -> init_state / apply_step
    - evaluate_* + check_convergence math  -> convergence_info
    - evaluate_primal_dual_kkt_matrix/rhs  -> eval_kkt_data + kkt_rhs
    - regularize_equality_gradient/hessian -> assemble_kkt(data, w_reg, c_reg)
    - set_primal_dual_kkt_solution + the
      get_delta_* family                   -> extract_deltas
    """

    @abc.abstractmethod
    def init_state(self) -> "IPState":
        """Initial iterate with bounds/dual processing applied."""

    @abc.abstractmethod
    def set_bounds_relaxation_factor(self, val: float) -> None: ...

    @abc.abstractmethod
    def get_bounds_relaxation_factor(self) -> float: ...

    @abc.abstractmethod
    def convergence_info(self, state, barrier, error_scaling=100.0):
        """Scaled infeasibilities + objective (a ConvergenceInfo)."""

    @abc.abstractmethod
    def eval_kkt_data(self, state, barrier):
        """Evaluate AD quantities + rhs once per iteration (opaque pytree)."""

    @abc.abstractmethod
    def assemble_kkt(self, data, w_reg, c_reg):
        """Solver-ready KKT with regularization applied (re-assemblable
        cheaply for the inertia-correction retry loop)."""

    @abc.abstractmethod
    def kkt_rhs(self, data):
        """The rhs evaluated by eval_kkt_data."""

    @abc.abstractmethod
    def extract_deltas(self, state, sol, barrier) -> "IPState":
        """Demultiplex the KKT solution into the 8 delta families,
        including the closed-form bound-dual deltas."""

    @abc.abstractmethod
    def fraction_to_the_boundary(self, state, deltas, tau) -> Tuple:
        """(alpha_primal_max, alpha_dual_max)."""

    @abc.abstractmethod
    def apply_step(self, state, deltas, alpha_primal, alpha_dual, alpha=1.0):
        """state + alpha * deltas (per-family step sizes)."""

    @property
    @abc.abstractmethod
    def expected_neg_eig(self) -> int:
        """Target number of negative KKT eigenvalues (constraint rows,
        including padding rows)."""

    # objective scaling (reference interface.py:302-306)
    obj_factor: float = 1.0

    def set_obj_factor(self, obj_factor: float) -> None:
        self.obj_factor = obj_factor

    def get_obj_factor(self) -> float:
        return self.obj_factor


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Bounds:
    """(Relaxed) bounds: xl/xu on primals, gl/gu on inequality bodies."""

    xl: Any
    xu: Any
    gl: Any
    gu: Any


# ---------------------------------------------------------------------------
# bounds relaxation (reference interface.py:394-424)
# ---------------------------------------------------------------------------


def relax_bounds_lower(lb: jax.Array, factor: float) -> jax.Array:
    """lb - factor*max(1, |lb|), left untouched at -inf."""
    return jnp.where(
        jnp.isfinite(lb), lb - factor * jnp.maximum(1.0, jnp.abs(lb)), lb
    )


def relax_bounds_upper(ub: jax.Array, factor: float) -> jax.Array:
    return jnp.where(
        jnp.isfinite(ub), ub + factor * jnp.maximum(1.0, jnp.abs(ub)), ub
    )


# ---------------------------------------------------------------------------
# initial point processing (reference interior_point.py:761-799)
# ---------------------------------------------------------------------------


def process_init(x: jax.Array, lb: jax.Array, ub: jax.Array) -> jax.Array:
    """Push initial values strictly inside their bounds."""
    lb_fin = jnp.isfinite(lb)
    ub_fin = jnp.isfinite(ub)
    lb_only = jnp.logical_and(lb_fin, jnp.logical_not(ub_fin))
    ub_only = jnp.logical_and(ub_fin, jnp.logical_not(lb_fin))
    both = jnp.logical_and(lb_fin, ub_fin)
    oob = jnp.logical_or(x >= ub, x <= lb)
    x = jnp.where(jnp.logical_and(oob, lb_only), lb + 1.0, x)
    x = jnp.where(jnp.logical_and(oob, ub_only), ub - 1.0, x)
    x = jnp.where(jnp.logical_and(oob, both), 0.5 * (lb + ub), x)
    return x


def process_init_duals_lb(z: jax.Array, lb: jax.Array) -> jax.Array:
    z = jnp.where(z <= 0.0, 1.0, z)
    return jnp.where(jnp.isneginf(lb), 0.0, z)


def process_init_duals_ub(z: jax.Array, ub: jax.Array) -> jax.Array:
    z = jnp.where(z <= 0.0, 1.0, z)
    return jnp.where(jnp.isposinf(ub), 0.0, z)


def validate_bounds(lb, ub) -> None:
    """Host-side check (reference interior_point.py:762-767)."""
    import numpy as np

    lb = np.asarray(lb)
    ub = np.asarray(ub)
    if np.any((ub - lb) < 0):
        raise ValueError(
            "Lower bounds for variables/inequalities should not be larger "
            "than upper bounds."
        )
    if np.any((ub - lb) == 0):
        raise ValueError(
            "Variables and inequalities should not have equal lower and "
            "upper bounds."
        )


# ---------------------------------------------------------------------------
# barrier terms (reference interface.py:449-461, 508-519)
# ---------------------------------------------------------------------------


def barrier_hessian_diag(x, lb, ub, zl, zu):
    """Sigma = zl/(x-lb) + zu/(ub-x); 0 contribution from infinite bounds."""
    lo = jnp.where(jnp.isfinite(lb), zl / (x - lb), 0.0)
    hi = jnp.where(jnp.isfinite(ub), zu / (ub - x), 0.0)
    return lo + hi


def log_barrier_sum(v, lb, ub):
    """sum over finite bounds of log(v - lb) + log(ub - v).

    Used by the filter line search's barrier objective phi.  Entries at (or
    beyond) a bound clamp at a tiny positive argument so the merit stays
    finite (fraction-to-the-boundary keeps trial iterates strictly inside,
    so the clamp only ever engages on padded/degenerate entries).
    """
    tiny = 1e-300
    lo = jnp.where(jnp.isfinite(lb), jnp.log(jnp.maximum(v - lb, tiny)), 0.0)
    hi = jnp.where(jnp.isfinite(ub), jnp.log(jnp.maximum(ub - v, tiny)), 0.0)
    return jnp.sum(lo) + jnp.sum(hi)


def barrier_grad_term(x, lb, ub, mu):
    """-mu/(x-lb) + mu/(ub-x): the barrier part of grad_lag wrt x (or s)."""
    lo = jnp.where(jnp.isfinite(lb), mu / (x - lb), 0.0)
    hi = jnp.where(jnp.isfinite(ub), mu / (ub - x), 0.0)
    return -lo + hi


# ---------------------------------------------------------------------------
# closed-form bound-dual deltas after the KKT solve (reference
# interface.py:548-570)
# ---------------------------------------------------------------------------


def delta_duals_lb(mu, z, dx, x, lb):
    return jnp.where(jnp.isfinite(lb), (mu - z * dx) / (x - lb) - z, 0.0)


def delta_duals_ub(mu, z, dx, x, ub):
    return jnp.where(jnp.isfinite(ub), (mu + z * dx) / (ub - x) - z, 0.0)


# ---------------------------------------------------------------------------
# fraction to the boundary (reference interior_point.py:655-674)
# ---------------------------------------------------------------------------


def ftb_lb(tau, x, dx, xl) -> jax.Array:
    """max alpha in (0, 1] with x + alpha*dx >= xl + (1-tau)(x-xl)."""
    if x.size == 0:
        return jnp.asarray(1.0, dtype=jnp.float64)
    dx_mod = jnp.where(dx == 0.0, 1.0, dx)
    alpha = -tau * (x - xl) / dx_mod
    alpha = jnp.where(dx >= 0.0, jnp.inf, alpha)
    return jnp.minimum(jnp.min(alpha), 1.0)


def ftb_ub(tau, x, dx, xu) -> jax.Array:
    if x.size == 0:
        return jnp.asarray(1.0, dtype=jnp.float64)
    dx_mod = jnp.where(dx == 0.0, 1.0, dx)
    alpha = tau * (xu - x) / dx_mod
    alpha = jnp.where(dx <= 0.0, jnp.inf, alpha)
    return jnp.minimum(jnp.min(alpha), 1.0)


def ftb_duals(tau, z, dz) -> jax.Array:
    """Dual families are bounded below by 0 (reference :731-756)."""
    return ftb_lb(tau, z, dz, jnp.zeros_like(z))


# ---------------------------------------------------------------------------
# convergence metrics (reference interior_point.py:174-317)
# ---------------------------------------------------------------------------


def _absmax(a: jax.Array) -> jax.Array:
    if a.size == 0:
        return jnp.asarray(0.0, dtype=jnp.float64)
    return jnp.max(jnp.abs(a))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConvergenceInfo:
    """Scaled infeasibilities; compl evaluated at both barrier=0 and barrier=mu
    (the IP loop needs both each iteration, reference :491 and :520)."""

    objective: jax.Array
    primal_inf: jax.Array
    dual_inf: jax.Array
    compl_inf_0: jax.Array
    compl_inf_mu: jax.Array
    # raw (unscaled) complementarity-product statistics over the finite
    # bounds, for adaptive barrier rules: mean, min and count of the
    # products (x-lb) z_lb / (ub-x) z_ub.  count == 0 (no finite bounds)
    # means avg/min are meaningless; consumers must fall back to the
    # monotone rule.
    compl_avg: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.0))
    compl_min: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(jnp.inf))
    compl_count: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0))


def _compl_residuals(x, lb, ub, z_lb, z_ub, barrier):
    lb_fin = jnp.isfinite(lb)
    ub_fin = jnp.isfinite(ub)
    lb_mod = jnp.where(lb_fin, lb, 0.0)
    ub_mod = jnp.where(ub_fin, ub, 0.0)
    lb_resid = jnp.where(lb_fin, (x - lb_mod) * z_lb - barrier, 0.0)
    ub_resid = jnp.where(ub_fin, (ub_mod - x) * z_ub - barrier, 0.0)
    return jnp.maximum(_absmax(lb_resid), _absmax(ub_resid))


def _compl_product_stats(x, lb, ub, z_lb, z_ub):
    """(sum, count, min) of the complementarity products over finite bounds."""
    lb_fin = jnp.isfinite(lb)
    ub_fin = jnp.isfinite(ub)
    lb_prod = jnp.where(lb_fin, (x - jnp.where(lb_fin, lb, 0.0)) * z_lb, 0.0)
    ub_prod = jnp.where(ub_fin, (jnp.where(ub_fin, ub, 0.0) - x) * z_ub, 0.0)
    total = jnp.sum(lb_prod) + jnp.sum(ub_prod)
    count = jnp.sum(lb_fin) + jnp.sum(ub_fin)
    mn = jnp.minimum(
        jnp.min(jnp.where(lb_fin, lb_prod, jnp.inf), initial=jnp.inf),
        jnp.min(jnp.where(ub_fin, ub_prod, jnp.inf), initial=jnp.inf),
    )
    return total, count, mn


def convergence_metrics(
    objective,
    grad_lag_primals,
    grad_lag_slacks,
    eq_resid,
    ineq_resid,
    primals,
    primals_lb,
    primals_ub,
    duals_primals_lb,
    duals_primals_ub,
    slacks,
    ineq_lb,
    ineq_ub,
    duals_slacks_lb,
    duals_slacks_ub,
    duals_eq,
    duals_ineq,
    n_duals_eq: int,
    n_duals_ineq: int,
    barrier,
    error_scaling: float,
) -> ConvergenceInfo:
    """IPOPT-style scaled infinity norms (reference :251-317).

    All array arguments are flat (structured interfaces concatenate their
    blocks first).  ``n_duals_eq``/``n_duals_ineq`` are the *logical* family
    sizes (excluding padding entries, whose duals are exactly 0 and whose
    bounds are infinite so they drop out of every sum below).
    """
    primal_inf = jnp.maximum(_absmax(eq_resid), _absmax(ineq_resid))
    dual_inf = jnp.maximum(_absmax(grad_lag_primals), _absmax(grad_lag_slacks))

    compl_0 = jnp.maximum(
        _compl_residuals(primals, primals_lb, primals_ub, duals_primals_lb, duals_primals_ub, 0.0),
        _compl_residuals(slacks, ineq_lb, ineq_ub, duals_slacks_lb, duals_slacks_ub, 0.0),
    )
    compl_mu = jnp.maximum(
        _compl_residuals(primals, primals_lb, primals_ub, duals_primals_lb, duals_primals_ub, barrier),
        _compl_residuals(slacks, ineq_lb, ineq_ub, duals_slacks_lb, duals_slacks_ub, barrier),
    )

    abs_dual_sum = (
        jnp.sum(jnp.abs(duals_eq))
        + jnp.sum(jnp.abs(duals_ineq))
        + jnp.sum(jnp.abs(duals_primals_lb))
        + jnp.sum(jnp.abs(duals_primals_ub))
        + jnp.sum(jnp.abs(duals_slacks_lb))
        + jnp.sum(jnp.abs(duals_slacks_ub))
    )
    n_bound_duals = (
        jnp.sum(jnp.isfinite(primals_lb))
        + jnp.sum(jnp.isfinite(primals_ub))
        + jnp.sum(jnp.isfinite(ineq_lb))
        + jnp.sum(jnp.isfinite(ineq_ub))
    )
    dual_denom = n_duals_eq + n_duals_ineq + n_bound_duals
    dual_scaling = abs_dual_sum / jnp.maximum(dual_denom, 1)
    dual_scaling = jnp.maximum(error_scaling, dual_scaling) / error_scaling

    abs_bound_dual_sum = (
        jnp.sum(jnp.abs(duals_primals_lb))
        + jnp.sum(jnp.abs(duals_primals_ub))
        + jnp.sum(jnp.abs(duals_slacks_lb))
        + jnp.sum(jnp.abs(duals_slacks_ub))
    )
    compl_scaling = abs_bound_dual_sum / jnp.maximum(n_bound_duals, 1)
    compl_scaling = jnp.maximum(error_scaling, compl_scaling) / error_scaling

    p_sum, p_cnt, p_min = _compl_product_stats(
        primals, primals_lb, primals_ub, duals_primals_lb, duals_primals_ub
    )
    s_sum, s_cnt, s_min = _compl_product_stats(
        slacks, ineq_lb, ineq_ub, duals_slacks_lb, duals_slacks_ub
    )
    compl_count = p_cnt + s_cnt
    compl_avg = (p_sum + s_sum) / jnp.maximum(compl_count, 1)
    compl_min = jnp.minimum(p_min, s_min)

    return ConvergenceInfo(
        objective=objective,
        primal_inf=primal_inf,
        dual_inf=dual_inf / dual_scaling,
        compl_inf_0=compl_0 / compl_scaling,
        compl_inf_mu=compl_mu / compl_scaling,
        compl_avg=compl_avg,
        compl_min=compl_min,
        compl_count=compl_count,
    )
