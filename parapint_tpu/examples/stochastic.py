"""Stochastic farmer example (Birge & Louveaux).

Transcription of the reference example
(/root/reference/parapint/examples/stochastic.py:20-124): three yield
scenarios; the first-stage decision is the acreage devoted to each crop.
Golden solution: WHEAT=170, CORN=80, SUGAR_BEETS=250 acres
(/root/reference/parapint/examples/tests/test_examples.py:31-33).
"""

import numpy as np
import jax.numpy as jnp

import parapint_tpu as pt

# crop order: WHEAT, CORN, SUGAR_BEETS (reference stochastic.py:22-39)
CROPS = ["WHEAT", "CORN", "SUGAR_BEETS"]
PRICE_QUOTA = np.array([100000.0, 100000.0, 6000.0])
SUB_PRICE = np.array([170.0, 150.0, 36.0])
SUPER_PRICE = np.array([0.0, 0.0, 10.0])
CATTLE_FEED = np.array([200.0, 240.0, 0.0])
PURCHASE_PRICE = np.array([238.0, 210.0, 100000.0])
PLANT_COST = np.array([150.0, 230.0, 260.0])
TOTAL_ACREAGE = 500.0
YIELDS = np.array(
    [
        [2.0, 2.4, 16.0],  # BelowAverageScenario
        [2.5, 3.0, 20.0],  # AverageScenario
        [3.0, 3.6, 24.0],  # AboveAverageScenario
    ]
)
PROBS = np.array([0.3333, 0.3334, 0.3333])


def scenario_objective(x, p):
    acre, sub, sup, purch = x[:3], x[3:6], x[6:9], x[9:12]
    expr = (
        jnp.dot(jnp.asarray(PURCHASE_PRICE), purch)
        - jnp.dot(jnp.asarray(SUB_PRICE), sub)
        - jnp.dot(jnp.asarray(SUPER_PRICE), sup)
        + jnp.dot(jnp.asarray(PLANT_COST), acre)
    )
    return p["prob"] * expr


def scenario_ineq(x, p):
    acre, sub, sup, purch = x[:3], x[3:6], x[6:9], x[9:12]
    total = jnp.sum(acre)[None]
    feed = p["yield"] * acre + purch - sub - sup  # >= CattleFeedRequirement
    limit = sub + sup - p["yield"] * acre  # <= 0
    quota = sub  # 0 <= sub <= PriceQuota
    return jnp.concatenate([total, feed, limit, quota])


def build_spec(yields=YIELDS, probs=PROBS) -> pt.StochasticModelSpec:
    N = yields.shape[0]
    n = 12  # [acreage(3), sub_quota_sold(3), super_quota_sold(3), purchased(3)]
    xl = np.zeros((N, n))
    xu = np.full((N, n), np.inf)
    xu[:, :3] = TOTAL_ACREAGE
    gl = np.concatenate([[-np.inf], CATTLE_FEED, [-np.inf] * 3, [0.0] * 3])
    gu = np.concatenate([[TOTAL_ACREAGE], [np.inf] * 3, [0.0] * 3, PRICE_QUOTA])
    return pt.StochasticModelSpec(
        num_scenarios=N,
        objective=scenario_objective,
        ineq_constraints=scenario_ineq,
        params={"yield": jnp.asarray(yields), "prob": jnp.asarray(probs)},
        x0=np.full((N, n), 10.0),
        first_stage_idx=[0, 1, 2],
        xl=xl,
        xu=xu,
        gl=np.broadcast_to(gl, (N, 10)),
        gu=np.broadcast_to(gu, (N, 10)),
    )


def main(linear_solver=None, mesh=None):
    interface = pt.StochasticSchurComplementInteriorPointInterface(
        build_spec(), mesh=mesh
    )
    options = pt.IPOptions()
    options.linalg.solver = linear_solver or pt.SchurComplementSolver(block_size=16)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal
    return interface


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO)
    interface = main()
    acre = np.asarray(interface.get_first_stage_values())
    for crop, val in zip(CROPS, acre):
        print(f"devoted_acreage[{crop}] = {val:.4f}")
