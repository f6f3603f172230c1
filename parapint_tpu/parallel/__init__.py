"""Mesh construction helpers for the block-parallel axis."""

from parapint_tpu.parallel.mesh import block_mesh, largest_divisor_mesh

__all__ = ["block_mesh", "largest_divisor_mesh"]
