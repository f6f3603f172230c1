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
