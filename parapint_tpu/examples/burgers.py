"""Burgers PDE optimal control — the flagship scaling example.

Transcription of the reference example
(/root/reference/parapint/examples/burgers.py:53-287): 1D viscous Burgers
distributed control,

    min  0.5 * int int ((y - y0)^2 + omega u^2) dx dt  (+ per-block t0 term)
    s.t. dy/dt - v d2y/dx2 + y dy/dx = r + u(x, t - dt)
         y = u = 0 at x in {0, 1};   y(x, 0) = y0(x), u(x, 0) = 0

discretized backward in time / central in space (the reference uses
Pyomo.DAE's finite_difference transformation, burgers.py:140-143; here the
finite differences are written directly in JAX), with the time horizon split
into blocks coupled through the interior y values at block boundaries.
"""

import numpy as np
import jax.numpy as jnp

import parapint_tpu as pt

OMEGA = 0.02
V = 0.01
R = 0.0


def build_spec(
    nfe_x: int = 50,
    nfe_t: int = 200,
    num_time_blocks: int = 4,
    start_t: float = 0.0,
    end_t: float = 1.0,
) -> pt.DynamicModelSpec:
    assert nfe_t % num_time_blocks == 0
    N = num_time_blocks
    nx = nfe_x  # space intervals; nx+1 grid points
    nt = nfe_t // N  # time steps per block; nt+1 local time points
    dt = (end_t - start_t) / nfe_t
    dx = 1.0 / nx
    npts = nx + 1
    n_y = (nt + 1) * npts
    n = 2 * n_y  # y then u, each (nt+1, npts) row-major (t, x)

    x_grid = dx * np.arange(npts)
    y0_profile = jnp.asarray((x_grid <= 0.5).astype(np.float64))

    # trapezoid weights
    wx = np.full(npts, dx)
    wx[0] = wx[-1] = 0.5 * dx
    wt = np.full(nt + 1, dt)
    wt[0] = wt[-1] = 0.5 * dt
    wx = jnp.asarray(wx)
    wt = jnp.asarray(wt)

    def split(vec):
        y = vec[:n_y].reshape(nt + 1, npts)
        u = vec[n_y:].reshape(nt + 1, npts)
        return y, u

    def objective(vec, p):
        y, u = split(vec)
        integrand = (y - y0_profile[None, :]) ** 2 + OMEGA * u**2
        int_x = integrand @ wx  # (nt+1,)
        obj = 0.5 * jnp.dot(wt, int_x)
        # per-block t0 control term (reference burgers.py:158-165)
        obj = obj + 0.25 * dx * dt * OMEGA * jnp.sum(u[0, 1:nx] ** 2)
        return obj

    def eq_constraints(vec, p):
        y, u = split(vec)
        bc = jnp.concatenate([y[:, 0], y[:, nx], u[:, 0], u[:, nx]])
        init = jnp.concatenate([y[0, 1:nx] - y0_profile[1:nx], u[0, 1:nx]])
        # PDE rows for t = 1..nt, x = 1..nx-1 (backward Euler in t, central
        # in x; u lagged one time step, reference burgers.py:127-136)
        y_c = y[1:, 1:nx]
        y_m = y[:-1, 1:nx]
        y_xp = y[1:, 2:]
        y_xm = y[1:, : nx - 1]
        u_lag = u[:-1, 1:nx]
        pde = (
            (y_c - y_m) / dt
            - V * (y_xp - 2.0 * y_c + y_xm) / dx**2
            + y_c * (y_xp - y_xm) / (2.0 * dx)
            - R
            - u_lag
        )
        return jnp.concatenate([bc, init, pde.reshape(-1)])

    me = 4 * (nt + 1) + 2 * (nx - 1) + nt * (nx - 1)
    eq_mask = np.ones((N, me), dtype=bool)
    # init-condition rows exist only in time block 0
    eq_mask[1:, 4 * (nt + 1) : 4 * (nt + 1) + 2 * (nx - 1)] = False

    # initial guess: y = y0 profile at all times, u = 0
    x0 = np.zeros((N, n))
    x0[:, :n_y] = np.tile(np.asarray(y0_profile), nt + 1)

    interior = np.arange(1, nx)
    return pt.DynamicModelSpec(
        num_blocks=N,
        objective=objective,
        eq_constraints=eq_constraints,
        params={"t0": jnp.asarray(dt * nt * np.arange(N), dtype=jnp.float64)},
        x0=x0,
        eq_mask=eq_mask,
        start_state_idx=interior,  # y[., t0_local] interior values
        end_state_idx=nt * npts + interior,
    )


def main(
    nfe_x: int = 50,
    nfe_t: int = 200,
    num_time_blocks: int = 4,
    linear_solver=None,
    mesh=None,
    options: "pt.IPOptions | None" = None,
    block_form: str = "dense",
):
    """``block_form="banded"`` routes the per-block KKTs through the banded
    factorization path (O(nk * bandwidth) per-block memory) — required for
    the reference's flagship scaling knob ``--nfe_x`` beyond ~100
    (/root/reference/parapint/examples/burgers.py:14-20), where the dense
    (N, nk, nk) batch no longer fits: the Burgers KKT bandwidth stays ~70
    under the fill-reducing ordering regardless of nfe_x."""
    spec = build_spec(nfe_x=nfe_x, nfe_t=nfe_t, num_time_blocks=num_time_blocks)
    interface = pt.DynamicSchurComplementInteriorPointInterface(
        spec, mesh=mesh, block_form=block_form
    )
    if options is None:
        options = pt.IPOptions()
    if linear_solver is not None:
        options.linalg.solver = linear_solver
    elif block_form == "banded":
        options.linalg.solver = pt.BandedSchurComplementSolver(
            schur_complement_solver=pt.BlockTridiagSolver(ns=interface.ns)
        )
    else:
        options.linalg.solver = pt.SchurComplementSolver(block_size=128)
    status = pt.ip_solve(interface, options)
    assert status == pt.InteriorPointStatus.optimal
    return interface


if __name__ == "__main__":
    import argparse
    import logging

    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--nfe_x", type=int, default=50)
    parser.add_argument("--nfe_t", type=int, default=200)
    parser.add_argument("--nblocks", type=int, default=4)
    parser.add_argument(
        "--block_form", choices=("dense", "banded"), default="dense"
    )
    args = parser.parse_args()
    interface = main(
        args.nfe_x, args.nfe_t, args.nblocks, block_form=args.block_form
    )
    print("objective:", float(interface.evaluate_objective()))
