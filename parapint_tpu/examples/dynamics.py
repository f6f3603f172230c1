"""Sin-tracking dynamics example.

Transcription of the reference example
(/root/reference/parapint/examples/dynamics.py:37-206): track
sin(0.1 t) + 1 with first-order dynamics dx/dt = p - x (implicit Euler),
piecewise-constant control p <= 2, trapezoid tracking objective; the horizon
is split into time blocks solved through the Schur-complement interface.

Per-block model (uniform across blocks; this problem has no initial
condition rows, matching the reference model):
  vars:  x[0..nfe] (nfe+1 states), p[0..np-1] (np controls)
  eq:    x[k+1] - x[k] - dt*(p[k // ccd] - x[k+1]) = 0
  obj:   sum_k 0.5*dt*((x[k]-target_k)^2 + (x[k+1]-target_{k+1})^2)
"""

import numpy as np
import jax.numpy as jnp

import parapint_tpu as pt


def build_spec(
    t0: int = 0,
    delta_t: int = 1,
    num_finite_elements: int = 90,
    constant_control_duration: int = 10,
    time_scale: float = 0.1,
    num_time_blocks: int = 3,
) -> pt.DynamicModelSpec:
    assert num_finite_elements % num_time_blocks == 0
    nfe = num_finite_elements // num_time_blocks  # per block
    assert constant_control_duration % delta_t == 0
    assert (nfe * delta_t) % constant_control_duration == 0
    n_p = (nfe * delta_t) // constant_control_duration
    fe_per_p = nfe // n_p
    n = (nfe + 1) + n_p  # x states then p controls

    def objective(v, p):
        x = v[: nfe + 1]
        t = p["t0"] + delta_t * jnp.arange(nfe + 1)
        target = jnp.sin(time_scale * t) + 1.0
        d2 = (x - target) ** 2
        return 0.5 * delta_t * jnp.sum(d2[:-1] + d2[1:])

    def eq_constraints(v, p):
        x = v[: nfe + 1]
        ctrl = v[nfe + 1 :]
        p_of_fe = jnp.repeat(ctrl, fe_per_p)
        return x[1:] - x[:-1] - delta_t * (p_of_fe - x[1:])

    N = num_time_blocks
    block_len = nfe * delta_t
    xu = np.full((N, n), np.inf)
    xu[:, nfe + 1 :] = 2.0  # p <= 2 (reference dynamics.py:81)
    return pt.DynamicModelSpec(
        num_blocks=N,
        objective=objective,
        eq_constraints=eq_constraints,
        params={"t0": jnp.asarray(t0 + block_len * np.arange(N), dtype=jnp.float64)},
        x0=np.zeros((N, n)),
        xu=xu,
        start_state_idx=[0],
        end_state_idx=[nfe],
    )


def main(
    linear_solver=None,
    num_finite_elements: int = 90,
    num_time_blocks: int = 3,
    constant_control_duration: int = 10,
    mesh=None,
    options: "pt.IPOptions | None" = None,
):
    spec = build_spec(
        num_finite_elements=num_finite_elements,
        num_time_blocks=num_time_blocks,
        constant_control_duration=constant_control_duration,
    )
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec, mesh=mesh)
    if options is None:
        options = pt.IPOptions()
    options.linalg.solver = linear_solver or pt.SchurComplementSolver(block_size=32)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal

    # stitch the global x(t) and p(t) trajectories
    nfe = num_finite_elements // num_time_blocks
    xs = np.asarray(interface.get_state().primals["blocks"])
    x_traj = [xs[0, : nfe + 1]]
    for i in range(1, num_time_blocks):
        x_traj.append(xs[i, 1 : nfe + 1])
    x_traj = np.concatenate(x_traj)
    p_traj = xs[:, nfe + 1 :].reshape(-1)
    return interface, x_traj, p_traj


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO)
    interface, x, p = main()
    print("p(t) =", p)
