"""Benchmark: interior-point iterations/s on a 64-block Burgers problem.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement
-----------
- Ours: full ``ip_solve`` of the Burgers optimal-control problem
  (nfe_x=50, nfe_t=256, 64 time blocks — the BASELINE.md 64-block flagship
  config) at tol 1e-8 on the available accelerator.  The solve runs twice;
  the second (compile-cache-warm) run is timed.  iterations/s = iterations /
  wall time.

Baseline
--------
The reference (sandialabs/parapint) cannot run here (no pyomo/mpi4py), so
the baseline is a faithful scipy re-implementation of its per-iteration KKT
linear-algebra path on the *same* assembled KKT blocks, idealized to
perfect 64-rank MPI scaling (zero communication cost):

  time/iter = max over blocks of (SuperLU factorization of the block +
              one back solve per nonzero border row for the SC contribution,
              the reference's loop in explicit_schur_complement.py:108-122)
              + replicated dense-SC factorization
              + the back-solve phase (2 block solves + SC solve)

This EXCLUDES the reference's per-iteration NLP evaluation (Pyomo/ASL) and
all MPI communication, both of which the reference must also pay — i.e. the
baseline is strictly favorable to the reference.  Our time includes
everything (evaluation, assembly, convergence checks, host control flow).
"""

import json
import time

import numpy as np


def build_problem(nfe_x=50, nfe_t=256, n_blocks=64):
    import parapint_tpu as pt
    from parapint_tpu.examples import burgers

    spec = burgers.build_spec(nfe_x=nfe_x, nfe_t=nfe_t, num_time_blocks=n_blocks)
    interface = pt.DynamicSchurComplementInteriorPointInterface(spec)
    return interface


def measure_ours(nfe_x=50, nfe_t=256, n_blocks=64, tol=1e-8):
    import parapint_tpu as pt

    iters = {"n": 0}

    def run():
        interface = build_problem(nfe_x, nfe_t, n_blocks)
        options = pt.IPOptions()
        options.tol = tol
        options.linalg.solver = pt.SchurComplementSolver(block_size=128)
        t0 = time.time()
        status = pt.ip_solve(interface, options)
        t1 = time.time()
        assert status == pt.InteriorPointStatus.optimal, status
        # iteration count: re-derive from the convergence path is awkward;
        # count via the options hook below instead.
        return interface, t1 - t0

    # warm-up run (compiles); instrument the second run
    import parapint_tpu.algorithms.interior_point as ipmod

    interface, _ = run()

    # count iterations by wrapping convergence_info
    interface2 = build_problem(nfe_x, nfe_t, n_blocks)
    orig = interface2.convergence_info

    def counting(*a, **k):
        iters["n"] += 1
        return orig(*a, **k)

    interface2.convergence_info = counting
    import parapint_tpu as pt

    options = pt.IPOptions()
    options.tol = tol
    options.linalg.solver = pt.SchurComplementSolver(block_size=128)
    t0 = time.time()
    status = pt.ip_solve(interface2, options)
    t1 = time.time()
    assert status == pt.InteriorPointStatus.optimal, status
    n_iter = iters["n"] - 1  # the final check terminates without a step
    return n_iter / (t1 - t0), n_iter, t1 - t0


def measure_reference_baseline(nfe_x=50, nfe_t=256, n_blocks=64):
    """Idealized 64-rank parapint per-iteration KKT time (see module doc)."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spla

    interface = build_problem(nfe_x, nfe_t, n_blocks)
    state = interface.init_state()
    interface._current_state = state
    data = interface.eval_kkt_data(state, 0.1)
    kkt = interface.assemble_kkt(data, 0.0, 0.0)
    diag = np.asarray(kkt.diag)
    border = np.asarray(kkt.border_loc)
    row_idx = np.asarray(kkt.row_idx)
    N, nk, _ = diag.shape
    ncv = kkt.q.shape[0]
    rhs_blocks = np.asarray(interface.kkt_rhs(data).blocks)

    block_times = []
    sc = np.zeros((ncv, ncv))
    lus = []
    for i in range(N):
        K = sps.csc_matrix(diag[i])
        t0 = time.time()
        lu = spla.splu(K)
        # SC contribution: one back solve per nonzero border row
        # (reference explicit_schur_complement.py:108-122)
        local = row_idx[i] < ncv
        for l in range(border.shape[1]):
            r = row_idx[i, l]
            if r < ncv and np.any(border[i, l] != 0.0):
                v = lu.solve(border[i, l])
                contrib = border[i] @ v  # A_i dot the contribution column
                sc[row_idx[i][local], r] -= contrib[local]
        block_times.append(time.time() - t0)
        lus.append(lu)

    t0 = time.time()
    sc_lu = spla.splu(sps.csc_matrix(sc + np.eye(ncv) * 0.0 + 1e-12 * np.eye(ncv)))
    sc_factor_time = time.time() - t0

    # back-solve phase: 2 block solves + SC solve (reference :363-402),
    # timed on the slowest block
    t0 = time.time()
    v0 = lus[0].solve(rhs_blocks[0])
    v0b = lus[0].solve(rhs_blocks[0])
    block_solve_time = time.time() - t0
    t0 = time.time()
    sc_lu.solve(np.ones(ncv))
    sc_solve_time = time.time() - t0

    time_per_iter = (
        max(block_times) + sc_factor_time + block_solve_time + sc_solve_time
    )
    return 1.0 / time_per_iter, time_per_iter


def main():
    ours_ips, n_iter, wall = measure_ours()
    base_ips, base_titer = measure_reference_baseline()
    result = {
        "metric": "ip_iterations_per_s_burgers_64blocks",
        "value": round(ours_ips, 4),
        "unit": "iter/s",
        "vs_baseline": round(ours_ips / base_ips, 4),
        "detail": {
            "n_iter": n_iter,
            "wall_s": round(wall, 3),
            "baseline_time_per_iter_s": round(base_titer, 4),
            "baseline": "idealized 64-rank parapint KKT path (scipy SuperLU), "
            "zero comm + zero eval cost",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
