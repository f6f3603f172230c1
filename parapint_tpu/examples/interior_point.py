"""Toy NLP example (reference /root/reference/parapint/examples/interior_point.py:5-27).

min x^2 + y^2  s.t.  y = exp(x),  y >= (x-1)^2
"""

import jax.numpy as jnp

import parapint_tpu as pt


def main(linear_solver=None):
    model = pt.NLPModel(
        objective=lambda v: v[0] ** 2 + v[1] ** 2,
        eq_constraints=lambda v: jnp.array([v[1] - jnp.exp(v[0])]),
        # body oriented as Pyomo canonicalizes `y >= (x-1)**2`
        ineq_constraints=lambda v: jnp.array([(v[0] - 1.0) ** 2 - v[1]]),
        gu=jnp.array([0.0]),
        x0=jnp.array([0.0, 0.0]),
    )
    interface = pt.InteriorPointInterface(model)
    options = pt.IPOptions()
    options.linalg.solver = linear_solver or pt.DenseLDLSolver(block_size=8)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal
    return interface


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO)
    interface = main()
    print("x* =", interface.get_primals())
