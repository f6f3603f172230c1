"""Dual warm-starting + custom scenario->shard ownership.

Reference parity targets:
- dual warm-start: interface.py:262-282 and :621-649 initialize all four
  bound-dual families plus eq/ineq duals from a prior solve's suffixes;
- ownership_map: mpi_sc_ip_interface.py:288-336 accepts a user-specified
  scenario->rank map for load balancing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import parapint_tpu as pt

from tests import test_dynamic as td
from tests import test_stochastic as ts


def _fused_solve(interface, max_iter=200):
    options = pt.IPOptions()
    options.linalg.solver = pt.SchurComplementSolver(block_size=16)
    options.max_iter = max_iter
    solve = pt.make_fused_ip_solve(interface, options)
    interface.set_bounds_relaxation_factor(options.bounds_relaxation_factor)
    result = solve(interface.init_state())
    assert int(result.status) == pt.InteriorPointStatus.optimal.value
    interface._current_state = result.state
    return result


class TestDualWarmStart:
    def test_warm_start_cuts_iterations(self):
        n_blocks = 4
        spec = td.make_dynamic_spec(n_blocks)
        interface = pt.DynamicSchurComplementInteriorPointInterface(spec)
        cold = _fused_solve(interface)
        cold_iters = int(cold.iterations)
        sol = cold.state

        warm_spec = td.make_dynamic_spec(n_blocks)
        warm_spec.x0 = jnp.asarray(sol.primals["blocks"])
        warm_spec.c0 = np.asarray(sol.primals["coupling"])
        warm_spec.y_eq0 = np.asarray(sol.duals_eq["own"])
        warm_spec.lam0 = np.asarray(sol.duals_eq["link"])
        warm_spec.y_ineq0 = np.asarray(sol.duals_ineq)
        warm_spec.zl0 = np.asarray(sol.duals_primals_lb["blocks"])
        warm_spec.zu0 = np.asarray(sol.duals_primals_ub["blocks"])
        warm_if = pt.DynamicSchurComplementInteriorPointInterface(warm_spec)
        # the warm values must actually ENTER the initial state (guards the
        # spec-plumbing regression that iteration counts alone can't: equal
        # counts could mask a completely ignored warm start)
        ws = warm_if.init_state()
        np.testing.assert_allclose(
            np.asarray(ws.duals_eq["own"]), np.asarray(sol.duals_eq["own"])
        )
        np.testing.assert_allclose(
            np.asarray(ws.primals["coupling"]),
            np.asarray(sol.primals["coupling"]),
        )
        warm = _fused_solve(warm_if)
        warm_iters = int(warm.iterations)
        # iteration SAVINGS are not guaranteed under every solver/tolerance
        # tweak; the hard assertions are warm-values-in-state (above),
        # no-regression, and solution parity
        assert warm_iters <= cold_iters, (warm_iters, cold_iters)
        # warm solution still matches the cold one
        np.testing.assert_allclose(
            np.asarray(warm.state.primals["coupling"]),
            np.asarray(sol.primals["coupling"]),
            atol=1e-6,
        )

    def test_warm_duals_enter_init_state(self):
        spec = ts.make_spec()
        N, n, mi = 3, 12, 10
        spec.y_eq0 = None
        spec.y_ineq0 = np.linspace(-1.0, 1.0, N * mi).reshape(N, mi)
        spec.zl0 = np.full((N, n), 0.25)
        spec.lam0 = np.arange(N * 3, dtype=float).reshape(N, 3)
        spec.c0 = np.array([10.0, 20.0, 30.0])
        spec.__post_init__()
        interface = pt.StochasticSchurComplementInteriorPointInterface(spec)
        state = interface.init_state()
        # coupling primal warm value
        np.testing.assert_allclose(
            np.asarray(state.primals["coupling"]), [10.0, 20.0, 30.0]
        )
        # link duals threaded through
        np.testing.assert_allclose(
            np.asarray(state.duals_eq["link"]),
            np.arange(N * 3, dtype=float).reshape(N, 3),
        )
        # ineq duals kept; slack duals split by sign then pushed positive
        np.testing.assert_allclose(
            np.asarray(state.duals_ineq), spec.y_ineq0
        )
        vl = np.asarray(state.duals_slacks_lb)
        vu = np.asarray(state.duals_slacks_ub)
        # positive where the corresponding bound is finite; zero at +-inf
        # bounds (process_init_duals_* mask them off)
        gl_fin = np.isfinite(np.asarray(spec.gl))
        gu_fin = np.isfinite(np.asarray(spec.gu))
        assert np.all(vl[gl_fin] > 0) and np.all(vu[gu_fin] > 0)
        assert np.all(vl[~gl_fin] == 0) and np.all(vu[~gu_fin] == 0)
        # where y_ineq0 is strongly positive (and the bound finite), vl
        # keeps the warm magnitude
        mask = (np.asarray(spec.y_ineq0) > 0.1) & gl_fin
        np.testing.assert_allclose(
            vl[mask], np.asarray(spec.y_ineq0)[mask], atol=1e-12
        )
        # bound duals: warm magnitude where the bound is finite
        zl = np.asarray(state.duals_primals_lb["blocks"])
        assert np.allclose(zl, 0.25)


class TestOwnershipMap:
    def test_ownership_permutation_solution_parity(self):
        if len(jax.devices()) < 3:
            pytest.skip("needs >= 3 devices")
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:3]), ("blocks",))
        # non-trivial ownership: scenario i -> shard (2 - i)
        interface = pt.StochasticSchurComplementInteriorPointInterface(
            ts.make_spec(), mesh=mesh, ownership_map=[2, 1, 0]
        )
        options = pt.IPOptions()
        options.linalg.solver = pt.ShardedSchurComplementSolver(
            mesh, "blocks", block_size=16
        )
        # fused solve: one compiled dispatch (the Python-loop sharded path
        # is covered by test_stochastic.py::TestFarmer::test_sharded)
        status, _ = pt.ip_solve_fused(interface, options)
        assert status == pt.InteriorPointStatus.optimal
        ts.check_solution(interface)
        # per-scenario accessors answer in ORIGINAL scenario indices:
        # scenario 2 (above-average yields) purchases nothing
        x2 = np.asarray(interface.get_block_primals(2))
        x0 = np.asarray(interface.get_block_primals(0))
        assert not np.allclose(x2[3:6], x0[3:6])
        # storage order is by shard: perm reverses
        np.testing.assert_array_equal(interface.block_perm, [2, 1, 0])
        # EVERY per-scenario accessor answers in ORIGINAL scenario order
        # (round-4 fix: inherited accessors used to return permuted storage
        # order, silently corrupting warm-start round trips)
        prim = interface.get_primals()
        for ndx in range(3):
            np.testing.assert_array_equal(
                np.asarray(prim["blocks"][ndx]),
                np.asarray(interface.get_block_primals(ndx)),
            )
        np.testing.assert_array_equal(
            np.asarray(interface.get_duals_eq()["link"]),
            np.asarray(interface.get_duals_nonanticipativity()),
        )
        # storage really is permuted: accessor output reverses raw state
        raw = np.asarray(interface._current_state.primals["blocks"])
        np.testing.assert_array_equal(
            np.asarray(prim["blocks"]), raw[::-1]
        )
        # shape-preserving pass-through for the remaining families
        assert np.asarray(interface.get_slacks()).shape == (3, 10)
        assert np.asarray(
            interface.get_duals_primals_lb()["blocks"]
        ).shape == (3, 12)
        np.testing.assert_array_equal(
            np.asarray(interface.get_duals_ineq()),
            np.asarray(interface._current_state.duals_ineq)[::-1],
        )

    def test_ownership_validation(self):
        from jax.sharding import Mesh

        if len(jax.devices()) < 3:
            pytest.skip("needs >= 3 devices")
        mesh = Mesh(np.array(jax.devices()[:3]), ("blocks",))
        with pytest.raises(ValueError, match="same number"):
            pt.StochasticSchurComplementInteriorPointInterface(
                ts.make_spec(), mesh=mesh, ownership_map=[0, 0, 1]
            )
        with pytest.raises(ValueError, match="requires mesh"):
            pt.StochasticSchurComplementInteriorPointInterface(
                ts.make_spec(), ownership_map=[0, 1, 2]
            )
