"""Co-occurrence dataset base (rebuild of
`/root/reference/cymf/dataset/cooccurrence.py`).

The class name keeps the reference's triple-r spelling
(``CooccurrrenceDataset``, `cooccurrence.py:18`) for drop-in compatibility,
with a correctly-spelled alias.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Union

from scipy import sparse

from .implicit import CACHE_DIR_NAME


class CooccurrrenceDataset:
    path: Path
    min_count: int
    window_size: int
    i2w: Dict[int, str]
    X: Union[sparse.csr_matrix, sparse.csc_matrix]

    def __init__(self, fname: str, min_count: int = 5, window_size: int = 10):
        self.root: Path = Path.home().joinpath(CACHE_DIR_NAME)
        self.root.mkdir(exist_ok=True)
        self.path: Path = self.root.joinpath(fname)
        self.min_count = min_count
        self.window_size = window_size

    def vocab_size(self):
        raise NotImplementedError()


CooccurrenceDataset = CooccurrrenceDataset
