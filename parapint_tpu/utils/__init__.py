from parapint_tpu.utils.timer import HierarchicalTimer
from parapint_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from parapint_tpu.utils import profile

__all__ = ["HierarchicalTimer", "save_checkpoint", "load_checkpoint", "profile"]
