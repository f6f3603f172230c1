"""Stochastic interface test: the Birge & Louveaux farmer problem.

Golden solution from the reference's example test
(/root/reference/parapint/examples/tests/test_examples.py:31-33):
devoted_acreage = {CORN: 80, SUGAR_BEETS: 250, WHEAT: 170}.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import parapint_tpu as pt

# crop order: WHEAT, CORN, SUGAR_BEETS
PRICE_QUOTA = np.array([100000.0, 100000.0, 6000.0])
SUB_PRICE = np.array([170.0, 150.0, 36.0])
SUPER_PRICE = np.array([0.0, 0.0, 10.0])
CATTLE_FEED = np.array([200.0, 240.0, 0.0])
PURCHASE_PRICE = np.array([238.0, 210.0, 100000.0])
PLANT_COST = np.array([150.0, 230.0, 260.0])
TOTAL_ACREAGE = 500.0
YIELDS = np.array(
    [
        [2.0, 2.4, 16.0],  # below average
        [2.5, 3.0, 20.0],  # average
        [3.0, 3.6, 24.0],  # above average
    ]
)
PROBS = np.array([0.3333, 0.3334, 0.3333])


def scenario_objective(x, p):
    acre, sub, sup, purch = x[:3], x[3:6], x[6:9], x[9:12]
    expr = (
        jnp.dot(PURCHASE_PRICE, purch)
        - jnp.dot(SUB_PRICE, sub)
        - jnp.dot(SUPER_PRICE, sup)
        + jnp.dot(PLANT_COST, acre)
    )
    return p["prob"] * expr


def scenario_ineq(x, p):
    acre, sub, sup, purch = x[:3], x[3:6], x[6:9], x[9:12]
    total = jnp.sum(acre)[None]
    feed = p["yield"] * acre + purch - sub - sup
    limit = sub + sup - p["yield"] * acre
    quota = sub
    return jnp.concatenate([total, feed, limit, quota])


def make_spec():
    N = 3
    n = 12
    xl = np.zeros((N, n))
    xu = np.full((N, n), np.inf)
    xu[:, :3] = TOTAL_ACREAGE
    gl = np.concatenate([[-np.inf], CATTLE_FEED, [-np.inf] * 3, [0.0] * 3])
    gu = np.concatenate([[TOTAL_ACREAGE], [np.inf] * 3, [0.0] * 3, PRICE_QUOTA])
    return pt.StochasticModelSpec(
        num_scenarios=N,
        objective=scenario_objective,
        ineq_constraints=scenario_ineq,
        params={"yield": jnp.asarray(YIELDS), "prob": jnp.asarray(PROBS)},
        x0=np.full((N, n), 10.0),
        first_stage_idx=[0, 1, 2],
        xl=xl,
        xu=xu,
        gl=np.broadcast_to(gl, (N, 10)),
        gu=np.broadcast_to(gu, (N, 10)),
    )


def check_solution(interface):
    acre = np.asarray(interface.get_first_stage_values())
    assert np.isclose(acre[0], 170.0, atol=1e-4)  # WHEAT
    assert np.isclose(acre[1], 80.0, atol=1e-4)  # CORN
    assert np.isclose(acre[2], 250.0, atol=1e-4)  # SUGAR_BEETS
    # each scenario's local first-stage copy agrees with the consensus value
    xs = np.asarray(interface.get_state().primals["blocks"])
    for i in range(3):
        assert np.allclose(xs[i, :3], acre, atol=1e-6)


class TestFarmer:
    @pytest.mark.slow  # farmer goldens also covered by test_examples
    def test_serial(self):
        interface = pt.StochasticSchurComplementInteriorPointInterface(make_spec())
        options = pt.IPOptions()
        options.linalg.solver = pt.SchurComplementSolver(block_size=16)
        status = pt.ip_solve(interface, options)
        assert status == pt.InteriorPointStatus.optimal
        check_solution(interface)

    @pytest.mark.slow
    def test_sharded(self):
        if len(jax.devices()) < 3:
            pytest.skip("needs >= 3 devices")
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:3]), ("blocks",))
        interface = pt.StochasticSchurComplementInteriorPointInterface(
            make_spec(), mesh=mesh
        )
        options = pt.IPOptions()
        options.linalg.solver = pt.ShardedSchurComplementSolver(
            mesh, "blocks", block_size=16
        )
        status = pt.ip_solve(interface, options)
        assert status == pt.InteriorPointStatus.optimal
        check_solution(interface)
