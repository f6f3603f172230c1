"""Interior-point algorithm tests.

Mirrors the reference's test pyramid for the algorithm layer
(/root/reference/parapint/algorithms/tests/test_interior_point.py):
pure-function unit tests for init processing and fraction-to-the-boundary,
plus end-to-end solves against known optima.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import parapint_tpu as pt
from parapint_tpu.interfaces import base


class TestProcessInit:
    def check(self, x, lb, ub, expected):
        got = np.asarray(base.process_init(jnp.asarray(x, dtype=jnp.float64),
                                           jnp.asarray(lb), jnp.asarray(ub)))
        assert np.allclose(got, expected)

    def test_free(self):
        inf = np.inf
        x = np.array([-2.0, -1, 0, 1, 2])
        self.check(x, -inf * np.ones(5), inf * np.ones(5), x)

    def test_lb_only(self):
        inf = np.inf
        lb = np.zeros(5)
        x = np.array([-2.0, -1, 0, 1, 2])
        # entries at or below lb get pushed to lb + 1
        self.check(x, lb, inf * np.ones(5), [1.0, 1.0, 1.0, 1.0, 2.0])

    def test_ub_only(self):
        inf = np.inf
        ub = np.zeros(5)
        x = np.array([-2.0, -1, 0, 1, 2])
        self.check(x, -inf * np.ones(5), ub, [-2.0, -1.0, -1.0, -1.0, -1.0])

    def test_both(self):
        lb = -np.ones(5)
        ub = np.ones(5)
        x = np.array([-2.0, -1, 0, 1, 2])
        self.check(x, lb, ub, [0.0, 0.0, 0.0, 0.0, 0.0])

    def test_validate(self):
        with pytest.raises(ValueError):
            base.validate_bounds(np.array([1.0]), np.array([0.0]))
        with pytest.raises(ValueError):
            base.validate_bounds(np.array([1.0]), np.array([1.0]))


class TestProcessInitDuals:
    def test_lb(self):
        z = np.array([-1.0, 0.0, 1.0, 2.0])
        lb = np.array([-np.inf, 0.0, 0.0, -np.inf])
        got = np.asarray(base.process_init_duals_lb(jnp.asarray(z), jnp.asarray(lb)))
        # nonpositive -> 1, then infinite-bound entries -> 0 regardless of
        # value (interface requirement, reference interior_point.py:14-21)
        assert np.allclose(got, [0.0, 1.0, 1.0, 0.0])

    def test_ub(self):
        z = np.array([-1.0, 0.0, 1.0, 2.0])
        ub = np.array([np.inf, 0.0, 0.0, np.inf])
        got = np.asarray(base.process_init_duals_ub(jnp.asarray(z), jnp.asarray(ub)))
        assert np.allclose(got, [0.0, 1.0, 1.0, 0.0])


class TestFractionToTheBoundary:
    def test_lb(self):
        tau = 0.9
        x = jnp.asarray([1.0, 1.0, 1.0, 1.0])
        xl = jnp.asarray([0.0, 0.0, -np.inf, 0.0])
        dx = jnp.asarray([-2.0, -0.5, -10.0, 1.0])
        alpha = float(base.ftb_lb(tau, x, dx, xl))
        # binding entry: x[0]: -0.9*1/-2 = 0.45
        assert np.isclose(alpha, 0.45)

    def test_ub(self):
        tau = 0.9
        x = jnp.asarray([1.0, 1.0, 1.0])
        xu = jnp.asarray([2.0, np.inf, 2.0])
        dx = jnp.asarray([4.0, 100.0, -1.0])
        alpha = float(base.ftb_ub(tau, x, dx, xu))
        assert np.isclose(alpha, 0.9 / 4.0)

    def test_no_binding(self):
        tau = 0.9
        x = jnp.asarray([1.0])
        assert float(base.ftb_lb(tau, x, jnp.asarray([1.0]), jnp.asarray([0.0]))) == 1.0
        assert float(base.ftb_ub(tau, x, jnp.asarray([-1.0]), jnp.asarray([2.0]))) == 1.0

    def test_empty(self):
        e = jnp.zeros(0)
        assert float(base.ftb_lb(0.9, e, e, e)) == 1.0
        assert float(base.ftb_ub(0.9, e, e, e)) == 1.0


def _solver():
    return pt.DenseLDLSolver(block_size=8)


class TestSolveInteriorPoint:
    def test_ip1(self):
        # reference golden (test_interior_point.py:21-42): x*=(0,1),
        # duals_eq=-4/3, duals_ineq=2/3 with the ineq body oriented as
        # (x-1)^2 - y <= 0 (Pyomo's canonical form for y >= (x-1)**2)
        model = pt.NLPModel(
            objective=lambda v: v[0] ** 2 + v[1] ** 2,
            eq_constraints=lambda v: jnp.array([v[1] - jnp.exp(v[0])]),
            ineq_constraints=lambda v: jnp.array([(v[0] - 1.0) ** 2 - v[1]]),
            gu=jnp.array([0.0]),
            x0=jnp.array([0.0, 0.0]),
        )
        interface = pt.InteriorPointInterface(model)
        options = pt.IPOptions()
        options.linalg.solver = _solver()
        status = pt.ip_solve(interface, options)
        assert status == pt.InteriorPointStatus.optimal
        x = np.asarray(interface.get_primals())
        assert np.isclose(x[0], 0.0, atol=1e-7)
        assert np.isclose(x[1], 1.0, atol=1e-7)
        assert np.isclose(float(interface.get_duals_eq()[0]), -1 - 1.0 / 3.0, atol=1e-7)
        assert np.isclose(float(interface.get_duals_ineq()[0]), 2.0 / 3.0, atol=1e-7)

    def test_ip2_bounds_only(self):
        # reference test (test_interior_point.py:44-54): min x^2, 1<=x<=4 -> x*=1
        model = pt.NLPModel(
            objective=lambda v: v[0] ** 2,
            x0=jnp.array([2.0]),
            xl=jnp.array([1.0]),
            xu=jnp.array([4.0]),
        )
        interface = pt.InteriorPointInterface(model)
        options = pt.IPOptions()
        options.linalg.solver = _solver()
        status = pt.ip_solve(interface, options)
        assert status == pt.InteriorPointStatus.optimal
        assert np.isclose(float(interface.get_primals()[0]), 1.0, atol=1e-6)

    def test_unconstrained(self):
        model = pt.NLPModel(
            objective=lambda v: (v[0] - 3.0) ** 2 + (v[1] + 2.0) ** 2,
            x0=jnp.array([0.0, 0.0]),
        )
        interface = pt.InteriorPointInterface(model)
        options = pt.IPOptions()
        options.linalg.solver = _solver()
        status = pt.ip_solve(interface, options)
        assert status == pt.InteriorPointStatus.optimal
        assert np.allclose(np.asarray(interface.get_primals()), [3.0, -2.0], atol=1e-7)

    def test_lu_solver(self):
        model = pt.NLPModel(
            objective=lambda v: v[0] ** 2 + v[1] ** 2,
            eq_constraints=lambda v: jnp.array([v[1] - jnp.exp(v[0])]),
            x0=jnp.array([0.0, 0.0]),
        )
        interface = pt.InteriorPointInterface(model)
        options = pt.IPOptions()
        options.linalg.solver = pt.DenseLUSolver(compute_inertia=True)
        status = pt.ip_solve(interface, options)
        assert status == pt.InteriorPointStatus.optimal


class TestRegularization:
    def test_regularization(self):
        # reference test_reg.py:17-68: bilinear model whose KKT is singular
        # at the all-zero start; numeric_factorization must regularize.
        # vars v = (x1, x2, x3, f3, F); f1=1, f2=2 fixed.
        from parapint_tpu.algorithms.interior_point import numeric_factorization

        model = pt.NLPModel(
            objective=lambda v: v[4] ** 2,
            eq_constraints=lambda v: jnp.array(
                [
                    v[0] + v[1] + v[2] - 1.0,
                    v[4] * v[0] - 1.0,
                    v[4] * v[1] - 2.0,
                    v[4] * v[2] - v[3],
                ]
            ),
            x0=jnp.zeros(5),
        )
        interface = pt.InteriorPointInterface(model)
        options = pt.IPOptions()
        options.linalg.solver = _solver()
        state = interface.init_state()
        data = interface.eval_kkt_data(state, 1e-1)
        options.linalg.solver.symbolic(interface.assemble_kkt(data, 0.0, 0.0))
        fact, reg_coef = numeric_factorization(
            interface=interface,
            data=data,
            options=options,
            inertia_coef=options.inertia_correction.init_coef,
        )
        assert reg_coef >= 1e-8
        pos, neg, zero = options.linalg.solver.inertia(fact)
        assert int(zero) == 0
        assert int(neg) == interface.n_eq_constraints() + interface.n_ineq_constraints()

    def test_reg_solve_to_optimality(self):
        # reference test_reg.py make_model_2 (:36-42): nonconvex model whose
        # Hessian needs regularization; solves to x*=1, y*=exp(-1)
        model = pt.NLPModel(
            objective=lambda v: -v[0] ** 2 - v[1] ** 2,
            ineq_constraints=lambda v: jnp.array([v[1] - jnp.exp(-v[0])]),
            gu=jnp.array([0.0]),
            x0=jnp.array([0.1, 0.1]),
            xl=jnp.array([0.0, 0.0]),
            xu=jnp.array([1.0, 1.0]),
        )
        interface = pt.InteriorPointInterface(model)
        options = pt.IPOptions()
        options.linalg.solver = _solver()
        status = pt.ip_solve(interface, options)
        assert status == pt.InteriorPointStatus.optimal
        v = np.asarray(interface.get_primals())
        assert np.isclose(v[0], 1.0, atol=1e-6)
        assert np.isclose(v[1], np.exp(-1.0), atol=1e-6)
