"""Pallas panel-factorization kernel vs the XLA reference implementation.

Runs in interpreter mode on CPU (the TPU path compiles the same kernel);
on-TPU equality with the XLA loop is exercised implicitly by every solver
test when the suite runs on TPU hardware.
"""

import numpy as np
import jax.numpy as jnp

from parapint_tpu.ops.ldl import _ldl_unblocked
from parapint_tpu.ops.pallas_ldl import ldl_panels


def test_panel_kernel_matches_xla_loop():
    rng = np.random.default_rng(0)
    B, b = 3, 32
    A = rng.standard_normal((B, b, b))
    A = A + np.swapaxes(A, 1, 2) + 4 * b * np.eye(b)
    out = np.asarray(ldl_panels(jnp.asarray(A), interpret=True))
    for i in range(B):
        ref = np.asarray(_ldl_unblocked(jnp.asarray(A[i])))
        assert np.allclose(np.tril(out[i]), np.tril(ref), atol=1e-12)


def test_panel_kernel_indefinite():
    rng = np.random.default_rng(1)
    d = np.array([3.0, -2.0, 1.0, -5.0] * 8)
    A = np.diag(d) + 0.01 * np.eye(32)
    out = np.asarray(ldl_panels(jnp.asarray(A[None]), interpret=True))[0]
    assert np.allclose(np.diag(out), d + 0.01, atol=1e-12)
