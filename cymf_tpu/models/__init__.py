from .bpr import BPR
from .wmf import WMF
from .relmf import RelMF
from .expomf import ExpoMF
from .glove import GloVe

__all__ = ["BPR", "WMF", "RelMF", "ExpoMF", "GloVe"]
