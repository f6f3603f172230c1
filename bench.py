"""Benchmark: interior-point iterations/s on a 64-block Burgers problem.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement (ours)
------------------
Full device-fused ``ip_solve_fused`` of the Burgers optimal-control problem
(nfe_x=50, nfe_t=256, 64 time blocks — the BASELINE.md 64-block flagship
config) at tol 1e-8 on the available accelerator, with the TPU fast path:
BANDED per-block factorization (block-Thomas over 128-wide tiles of the
bandwidth-permuted per-block KKTs, f32 tile factors with per-tile Ruiz
equilibration, adaptive f64 iterative refinement — the MA27-envelope path,
see _block_form) and the cyclic-reduction tile solver on the chain-topology
Schur complement.  The solve runs twice; the second (compile-warm) run is
timed.
iterations/s = IP iterations / wall time, all evaluation/assembly/
factorization/convergence work included.

Baseline
--------
The reference (sandialabs/parapint) cannot run here (no pyomo/mpi4py), so
the baseline reconstructs its per-iteration KKT linear-algebra path with
scipy on the *same* assembled KKT blocks, idealized to perfect 64-rank MPI
scaling (zero communication cost):

  time/iter = max over blocks of (SuperLU factorization of the block +
              one back solve per nonzero border row for the SC contribution,
              the reference's loop in explicit_schur_complement.py:108-122)
              + replicated dense-SC factorization
              + the back-solve phase (2 block solves + SC solve)

This EXCLUDES the reference's per-iteration NLP evaluation (Pyomo/ASL),
all MPI communication (the 64-rank reference all-reduces the dense SC data
— ~76 MB f64 — every factorization, mpi_explicit_schur_complement.py:343),
and sparse-format conversions, all of which the reference must also pay —
i.e. the baseline is strictly favorable to the reference.  It models 64
perfectly-scaled CPU ranks; the measurement here runs on ONE chip, so
``vs_baseline`` understates the framework: the block axis is the sharded
axis, and on an n-chip mesh the per-chip block work divides by n while only
the replicated SC factorization and one small psum remain (see
docs/benchmarks.md).  The baseline runs in a CPU-only subprocess.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NFE_X = 50
NFE_T = 256
N_BLOCKS = 64
TOL = 1e-8


def build_problem(
    nfe_x=NFE_X, nfe_t=NFE_T, n_blocks=N_BLOCKS, kkt_dtype="f32", block_form=None
):
    import jax.numpy as jnp
    import parapint_tpu as pt
    from parapint_tpu.examples import burgers

    spec = burgers.build_spec(nfe_x=nfe_x, nfe_t=nfe_t, num_time_blocks=n_blocks)
    # kkt_dtype=f32: the Hessian AD sweep and the KKT-matrix assembly run in
    # f32 (the matrix feeds the f32 factorization anyway); rhs, gradients and
    # convergence residuals stay f64 so tol=1e-8 remains certifiable.  The
    # scipy baseline passes kkt_dtype=None (it factors in f64).
    kw = {} if block_form is None else {"block_form": block_form}
    return pt.DynamicSchurComplementInteriorPointInterface(
        spec, kkt_dtype=jnp.float32 if kkt_dtype == "f32" else None, **kw
    )


def _block_form():
    """PT_BENCH_BLOCK in {banded, dense}: per-block factorization family.

    Default "banded" (round 5): the flagship runs the MA27-envelope path
    (linalg/banded_schur.py) — block-Thomas over ts x ts tiles of the
    bandwidth-permuted per-block KKTs, O(nk * ts) factor bytes instead of
    the dense path's O(nk^2) explicit W.  Chip-measured (floor-free
    iteration differencing, tol pinned so the fused while_loop runs
    exactly N iterations): banded ts=128 18.9 ms/iter vs dense 27.6 —
    1.46x — because this environment's HBM streaming floor is ~190 GB/s
    and the banded factor/solve streams ~4x fewer bytes
    (docs/benchmarks.md round 5).  "dense" restores the round-4 path."""
    return os.environ.get("PT_BENCH_BLOCK", "banded")


def _make_solver(iface=None):
    import jax.numpy as jnp
    import parapint_tpu as pt

    if _block_form() == "banded":
        # ts=128 beats the bandwidth-snapped default (72 for this family):
        # chip A/B 34.9 vs 30.0 iter/s — fewer sequential tile steps win
        # over smaller tiles on the MXU (docs/benchmarks.md round 5)
        ts = int(os.environ.get("PT_BENCH_TS", "128"))
        return pt.BandedSchurComplementSolver(
            schur_complement_solver=pt.BlockTridiagSolver(ns=iface.ns),
            tile_size=ts,
        )

    # refine_steps=0 is validated for this benchmark problem on TPU
    # (converges to tol 1e-8; ~40% faster per iteration than the safe
    # default of one f64 refinement pass).  The chain-topology SC is block
    # tridiagonal: the cyclic-reduction tile solver factors it in
    # O(N * ns^3) instead of the dense O(((N-1) ns)^3).
    sc = (
        None
        if os.environ.get("PT_BENCH_SC") == "dense"
        else pt.BlockTridiagSolver()
    )
    # A/B/C knobs for the bf16-W experiment (VERDICT r4 item 5):
    #   PT_BENCH_W=bf16      store W in bf16 (halves the apply HBM reads)
    #   PT_BENCH_REFINE=adaptive  adaptive refinement (enables the bf16
    #                        auto-gate; costs a probe matvec per solve)
    w_store = (
        jnp.bfloat16 if os.environ.get("PT_BENCH_W") == "bf16" else None
    )
    refine = (
        None if os.environ.get("PT_BENCH_REFINE") == "adaptive" else 0
    )
    return pt.SchurComplementSolver(
        block_size=128, explicit_inverse=True, factor_dtype=jnp.float32,
        refine_steps=refine, schur_complement_solver=sc,
        w_store_dtype=w_store,
    )


def measure_ours(nfe_x=NFE_X, nfe_t=NFE_T, n_blocks=N_BLOCKS, tol=TOL):
    import parapint_tpu as pt

    interface = build_problem(
        nfe_x,
        nfe_t,
        n_blocks,
        block_form="banded" if _block_form() == "banded" else None,
    )
    options = pt.IPOptions()
    options.tol = tol
    options.linalg.solver = _make_solver(interface)
    solve = pt.make_fused_ip_solve(interface, options)
    interface.set_bounds_relaxation_factor(options.bounds_relaxation_factor)
    state0 = interface.init_state()

    # run 1: compile + solve; then best of 3 warm regions of K back-to-back
    # solves each.  One fused solve is a single dispatch whose wall carries
    # ~2 relay round trips (enqueue + result readback, ~24 ms each, jitter
    # 2-24 ms — docs/ROUND4.md); K solves pipeline through the relay so the
    # fixed cost amortizes, the same discipline bench_all.py applies to its
    # sub-second rows.  The reference pays no such relay (its MPI ranks are
    # local), so amortizing is the honest comparison.
    result = solve(state0)
    status = int(result.status)
    n_iter = int(result.iterations)
    assert status == pt.InteriorPointStatus.optimal.value, (
        status,
        n_iter,
        float(result.primal_inf),
        float(result.dual_inf),
        float(result.compl_inf),
    )
    K = 3
    wall = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(K):
            result = solve(state0)
        n_iter = int(result.iterations)  # forces completion of the region
        wall = min(wall, (time.time() - t0) / K)
    steps = max(1, n_iter - 1)  # final iteration is the terminating check
    return steps / wall, n_iter, wall


def measure_reference_baseline(nfe_x=NFE_X, nfe_t=NFE_T, n_blocks=N_BLOCKS):
    """Idealized n_blocks-rank parapint per-iteration KKT time (module doc)."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spla

    interface = build_problem(nfe_x, nfe_t, n_blocks, kkt_dtype=None)
    state = interface.init_state()
    interface._current_state = state
    data = interface.eval_kkt_data(state, 0.1)
    # light regularization so the unregularized zero pivots do not
    # penalize the baseline's SuperLU either
    kkt = interface.assemble_kkt(data, 1e-8, 1e-8)
    diag = np.asarray(kkt.diag)
    border = np.asarray(kkt.border_loc)
    row_idx = np.asarray(kkt.row_idx)
    N, nk, _ = diag.shape
    ncv = kkt.q.shape[0]
    rhs_blocks = np.asarray(interface.kkt_rhs(data).blocks)

    # host timings are noisy (the TPU relay shares this host): take the
    # minimum of two repetitions of every timed section
    def timed(fn, reps=4):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        return best, out

    block_times = []
    sc = np.zeros((ncv, ncv))
    lus = []
    for i in range(N):
        K = sps.csc_matrix(diag[i])

        def block_work():
            lu = spla.splu(K)
            # SC contribution: one back solve per nonzero border row
            # (reference explicit_schur_complement.py:108-122)
            cols = {}
            for l in range(border.shape[1]):
                r = row_idx[i, l]
                if r < ncv and np.any(border[i, l] != 0.0):
                    v = lu.solve(border[i, l])
                    cols[r] = border[i] @ v
            return lu, cols

        t, (lu, cols) = timed(block_work)
        local = row_idx[i] < ncv
        for r, contrib in cols.items():
            sc[row_idx[i][local], r] -= contrib[local]
        block_times.append(t)
        lus.append(lu)

    sc_mat = sps.csc_matrix(sc + 1e-10 * np.eye(ncv))
    sc_factor_time, sc_lu = timed(lambda: spla.splu(sc_mat))

    # back-solve phase: 2 block solves + SC solve (reference :363-402)
    block_solve_time, _ = timed(
        lambda: (lus[0].solve(rhs_blocks[0]), lus[0].solve(rhs_blocks[0]))
    )
    sc_solve_time, _ = timed(lambda: sc_lu.solve(np.ones(ncv)))

    time_per_iter = (
        max(block_times) + sc_factor_time + block_solve_time + sc_solve_time
    )
    return 1.0 / time_per_iter, time_per_iter


def main():
    if "--baseline-only" in sys.argv:
        ips, titer = measure_reference_baseline()
        print(json.dumps({"baseline_ips": ips, "time_per_iter": titer}))
        return

    ours_ips, n_iter, wall = measure_ours()

    # baseline in a CPU-only subprocess (scipy path; keeps the accelerator
    # out of the data movement)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--baseline-only"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    base = json.loads(out.stdout.strip().splitlines()[-1])
    base_ips = base["baseline_ips"]

    result = {
        "metric": "ip_iterations_per_s_burgers_64blocks",
        "value": round(ours_ips, 4),
        "unit": "iter/s",
        "vs_baseline": round(ours_ips / base_ips, 4),
        "detail": {
            "n_iter": n_iter,
            "wall_s": round(wall, 3),
            "baseline_time_per_iter_s": round(base["time_per_iter"], 4),
            "baseline": "idealized 64-rank parapint KKT path (scipy SuperLU), "
            "zero comm + zero eval cost",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
