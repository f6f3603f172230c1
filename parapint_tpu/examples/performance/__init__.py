from parapint_tpu.examples.performance import schur_complement

__all__ = ["schur_complement"]
