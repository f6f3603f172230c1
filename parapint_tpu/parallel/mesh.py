"""Device-mesh helpers.

The framework's single parallel axis is the block axis (time blocks /
scenarios — SURVEY.md section 2.3: the reference's only parallelism is
block decomposition over MPI ranks).  These helpers build the 1-D mesh the
sharded solvers and interfaces consume; multi-host slices work identically
(`jax.devices()` spans hosts under `jax.distributed`).
"""

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def block_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "blocks",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 1-D mesh over ``n_devices`` (default: all) for the block axis."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def largest_divisor_mesh(n_blocks: int, axis_name: str = "blocks") -> Mesh:
    """The largest mesh whose size divides ``n_blocks`` (the sharded solvers
    require the block count to be a multiple of the mesh axis size)."""
    n = len(jax.devices())
    while n > 1 and n_blocks % n != 0:
        n -= 1
    return block_mesh(n, axis_name)
