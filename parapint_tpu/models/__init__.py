"""NLP model layer: models are pure JAX functions; AD replaces Pyomo/ASL."""

from parapint_tpu.models.model import NLPModel
from parapint_tpu.models.ad import NLPFunctions

__all__ = ["NLPModel", "NLPFunctions"]
