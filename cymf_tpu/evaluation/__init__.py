from .evaluator import (Evaluator, AverageOverAllEvaluator, AoaEvaluator,
                        UnbiasedEvaluator)
from . import metrics

__all__ = ["Evaluator", "AverageOverAllEvaluator", "AoaEvaluator",
           "UnbiasedEvaluator", "metrics"]
