from .checkpoint import AsyncCheckpointer, save_checkpoint, load_checkpoint
from .profiling import trace, annotate, Throughput

__all__ = ["AsyncCheckpointer", "save_checkpoint", "load_checkpoint",
           "trace", "annotate", "Throughput"]
