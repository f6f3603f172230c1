from parapint_tpu.utils.timer import HierarchicalTimer

__all__ = ["HierarchicalTimer"]
