"""jax.profiler integration.

The reference threads a HierarchicalTimer through every layer (SURVEY.md
section 5.1); on TPU the device-side equivalent is an XLA trace.  This
helper wraps any solve/step callable in a profiler trace whose output loads
in TensorBoard / Perfetto.
"""

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager: capture a device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_call(log_dir: str, fn, *args, **kwargs):
    """Run ``fn(*args, **kwargs)`` under a trace and block on the result."""
    with trace(log_dir):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out


def leafsum(out):
    """A traced f32 scalar depending on every floating leaf of ``out``.

    Fused INTO the timed jit (see :func:`timed_fused`), reading it forces
    the whole computation — ``block_until_ready`` can complete at enqueue
    time on relayed backends (observed on the axon TPU tunnel), and a
    SEPARATE per-leaf readback pays the relay's per-dispatch floor once
    per leaf (~27 ms each), swamping iteration-scale phases.
    """
    import jax.numpy as jnp

    tot = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(out):
        a = jnp.asarray(leaf)
        if a.size and jnp.issubdtype(a.dtype, jnp.floating):
            tot = tot + jnp.sum(jnp.abs(a.astype(jnp.float32)))
    return tot


_FLOOR = None


def dispatch_floor(refresh: bool = False) -> float:
    """Measured per-dispatch relay floor (cached; it VARIES between
    sessions and even within one — re-measure with ``refresh=True`` near
    the timings it will be subtracted from)."""
    import time

    import jax.numpy as jnp

    global _FLOOR
    if _FLOOR is None or refresh:
        g = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0)
        float(g(x))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        _FLOOR = best
    return _FLOOR


def timed_fused(f, *a, reps: int = 5, subtract_floor: bool = True):
    """(output, best-of-``reps`` seconds) for one call of ``f``.

    The readback reduction (:func:`leafsum`) is fused into the SAME jitted
    dispatch as ``f`` and the measured dispatch floor is subtracted — the
    only per-call timing recipe that is honest on the relayed TPU backend
    (see tools/kernel_lab.py's module docstring for the amortized-loop
    variant, preferable for sub-millisecond kernels).
    """
    import time

    floor = dispatch_floor() if subtract_floor else 0.0

    def fused(*aa):
        out = f(*aa)
        return leafsum(out), out

    g = jax.jit(fused)
    tot, out = g(*a)
    float(tot)  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        tot, out = g(*a)
        float(tot)
        best = min(best, time.perf_counter() - t0)
    return out, max(0.0, best - floor)


def solver_phase_breakdown(solver, kkt, rhs, reps: int = 3):
    """Host-side per-phase wall times of one factor+solve cycle.

    The reference's MPI SC solver reports internal timers for
    ``form SC`` / ``factorize SC`` / ``communicate`` / ``back solve``
    (mpi_explicit_schur_complement.py:207-360).  Under whole-solve fusion
    those phases are not separable at runtime, so this diagnostic runs the
    *unfused* phases — each jitted alone, timed by :func:`timed_fused`
    (readback reduction fused into the dispatch, floor subtracted) — on
    the given KKT system.  It localizes perf regressions without a full
    profiler trace; for in-fusion attribution the solver also emits
    ``jax.named_scope`` labels with the same names, visible in
    ``jax.profiler`` traces (see :func:`trace`).

    Returns a dict: phase name -> best-of-``reps`` seconds.
    """
    times = {}
    fact, times["numeric (factor blocks + form SC + factor SC)"] = timed_fused(
        solver.numeric, kkt, reps=reps
    )
    _, times["solve (block solves + SC back solve)"] = timed_fused(
        solver.solve, fact, rhs, reps=reps
    )
    return times
