"""Worked examples, mirroring the reference's example set
(/root/reference/parapint/examples/): toy NLP interior point, sin-tracking
dynamics, Burgers PDE optimal control, stochastic farmer, and the synthetic
Schur-complement performance harness."""

from parapint_tpu.examples import interior_point, dynamics, burgers, stochastic

__all__ = ["interior_point", "dynamics", "burgers", "stochastic"]
