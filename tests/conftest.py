"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference tests multi-node behavior by oversubscribing MPI ranks on one
CI node (/root/reference/.github/workflows/main_ci.yml:33-41); we do the
same with XLA's virtual host devices: 8 CPU devices in one process, so all
shard_map collectives execute for real in CI without a TPU pod.

These environment variables must be set before jax (or anything importing
jax) is imported, which is why this lives at the top of conftest.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU tunnel plugin
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
