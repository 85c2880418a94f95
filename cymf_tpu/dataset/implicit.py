"""Implicit-feedback dataset base (rebuild of
`/root/reference/cymf/dataset/implicit.py`).

Holds train/valid/test ``scipy.sparse.lil_matrix`` splits plus user/item
counts; concrete loaders (MovieLens, YahooMusic) fill them in.  The cache
root is ``~/.cymf_tpu`` (the reference uses ``~/.cymf``,
`implicit.py:36-38`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
import pandas as pd
from scipy import sparse

CACHE_DIR_NAME = ".cymf_tpu"


class ImplicitFeedbackDataset:
    num_user: int
    num_item: int
    train_size: int
    valid_size: int
    test_size: int
    train: sparse.lil_matrix
    valid: sparse.lil_matrix
    test: sparse.lil_matrix

    def __init__(self, dir_name: str, min_rating: float = 4.0,
                 gamma: float = 0.2) -> None:
        self.root: Path = Path.home().joinpath(CACHE_DIR_NAME)
        self.root.mkdir(exist_ok=True)
        self.dir_path: Path = self.root.joinpath(dir_name)
        self.min_rating: float = min_rating

    def to_matrix(self, df: pd.DataFrame) -> sparse.lil_matrix:
        """(user, item) -> rating lil_matrix (`implicit.py:41-45`), built
        vectorized through COO instead of a per-entry Python loop."""
        # duplicate (u, i) pairs: lil assignment keeps the last value, COO
        # sums — deduplicate keeping the last occurrence to match.
        dedup = df.drop_duplicates(subset=["user", "item"], keep="last")
        m = sparse.coo_matrix(
            (dedup["rating"].values,
             (dedup["user"].values.astype(np.int64),
              dedup["item"].values.astype(np.int64))),
            shape=(self.num_user, self.num_item))
        return m.tolil()

    def to_dataframe(self, matrix: sparse.lil_matrix) -> pd.DataFrame:
        df = pd.DataFrame(matrix.toarray()).stack().reset_index()
        df.columns = ("user", "item", "rating")
        df = df[df["rating"] >= 0]
        return df

    def split(self, df) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return df.user.values, df.item.values, df.rating.values[:, None]

    def _finalize(self):
        self.train_size = self.train.nnz
        self.valid_size = self.valid.nnz
        self.test_size = self.test.nnz
