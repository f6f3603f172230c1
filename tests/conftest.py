"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference tests multi-node behavior by oversubscribing MPI ranks on one
CI node (/root/reference/.github/workflows/main_ci.yml:33-41); we do the
same with XLA's virtual host devices: 8 CPU devices in one process, so all
shard_map collectives execute for real in CI without a TPU pod.

Env vars alone are not enough here: pytest plugins (jaxtyping, hypothesis)
import jax before this conftest runs, so we also set the platform through
the jax config API, which works any time before the backend is first used.
"""

import os

# PT_TEST_TPU=1 leaves the real backend in place so the `tpu`-marked tests
# (tests/test_tpu_kernels.py) run on the chip:
#   PT_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -m tpu
if os.environ.get("PT_TEST_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU tunnel

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
