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


def solver_phase_breakdown(solver, kkt, rhs, reps: int = 3):
    """Host-side per-phase wall times of one factor+solve cycle.

    The reference's MPI SC solver reports internal timers for
    ``form SC`` / ``factorize SC`` / ``communicate`` / ``back solve``
    (mpi_explicit_schur_complement.py:207-360).  Under whole-solve fusion
    those phases are not separable at runtime, so this diagnostic runs the
    *unfused* phases — each jitted alone, timed with blocking readbacks —
    on the given KKT system.  It localizes perf regressions without a full
    profiler trace; for in-fusion attribution the solver also emits
    ``jax.named_scope`` labels with the same names, visible in
    ``jax.profiler`` traces (see :func:`trace`).

    Returns a dict: phase name -> best-of-``reps`` seconds.
    """
    import time

    import jax.numpy as jnp

    def _force(out):
        # value-dependent scalar readback: block_until_ready can complete at
        # enqueue time on relayed/remote backends (observed on the axon TPU
        # tunnel), silently reporting near-zero times.  The forced scalar
        # depends on EVERY leaf — a single-leaf readback does not guarantee
        # completion when the callable issues multiple dispatches or its
        # first output is produced early.
        total = 0.0
        for leaf in jax.tree_util.tree_leaves(out):
            a = jnp.asarray(leaf)
            if jnp.issubdtype(a.dtype, jnp.floating) or jnp.issubdtype(
                a.dtype, jnp.integer
            ):
                total += float(jnp.sum(jnp.abs(a.astype(jnp.float32))))
        return out

    def _timed(f, *a):
        out = _force(f(*a))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(f(*a))
            best = min(best, time.perf_counter() - t0)
        return out, best

    times = {}
    fact, times["numeric (factor blocks + form SC + factor SC)"] = _timed(
        jax.jit(solver.numeric), kkt
    )
    _, times["solve (block solves + SC back solve)"] = _timed(
        jax.jit(solver.solve), fact, rhs
    )
    return times
