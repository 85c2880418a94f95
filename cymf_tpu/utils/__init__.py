from .checkpoint import save_checkpoint, load_checkpoint
from .profiling import trace, annotate, Throughput

__all__ = ["save_checkpoint", "load_checkpoint", "trace", "annotate",
           "Throughput"]
