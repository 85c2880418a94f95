from .segment import dedup_rows, csr_contains, csr_lookup
from .hashset import build_pair_hashset, hashset_contains, PairHashSet
from . import als

__all__ = ["dedup_rows", "csr_contains", "csr_lookup",
           "build_pair_hashset", "hashset_contains", "PairHashSet", "als"]
