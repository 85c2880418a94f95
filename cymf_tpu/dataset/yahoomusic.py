"""Yahoo! R3 loader (rebuild of `/root/reference/cymf/dataset/yahoomusic.py`).

The R3 dataset requires manual download from the Yahoo Webscope program; like
the reference (`yahoomusic.py:24-27`) we print instructions when the data is
absent, but raise ``FileNotFoundError`` instead of calling ``exit(1)`` (a
known reference wart: libraries should not kill the interpreter).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from sklearn.model_selection import train_test_split

from .implicit import ImplicitFeedbackDataset


class YahooMusic(ImplicitFeedbackDataset):
    def __init__(self, min_rating: float = 4.0,
                 under_sampling: Optional[int] = None):
        super().__init__("yahoomusic", min_rating)

        if not self.dir_path.exists():
            msg = (
                "download R3 dataset from "
                "https://webscope.sandbox.yahoo.com/catalog.php?datatype=r , "
                f"and put it on {self.dir_path.as_posix()}.")
            print(msg)
            raise FileNotFoundError(msg)

        self.df_train = pd.read_csv(
            self.dir_path.joinpath("ydata-ymusic-rating-study-v1_0-train.txt"),
            sep="\t", names=["user", "item", "rating"])
        self.df_train["user"] -= 1
        self.df_train["item"] -= 1
        self.df_train = self.df_train[self.df_train["rating"] >= min_rating]
        self.df_train = self.df_train.copy()
        self.df_train["rating"] = 1.0

        self.df_test = pd.read_csv(
            self.dir_path.joinpath("ydata-ymusic-rating-study-v1_0-test.txt"),
            sep="\t", names=["user", "item", "rating"])
        self.df_test["user"] -= 1
        self.df_test["item"] -= 1
        self.df_test = self.df_test[self.df_test["rating"] >= min_rating]
        self.df_test = self.df_test.copy()
        self.df_test["rating"] = 1.0

        self.num_user = max(self.df_train.user) + 1
        self.num_item = max(self.df_train.item) + 1

        self.df_train, self.df_valid = train_test_split(
            self.df_train, test_size=0.1, random_state=12345)

        self.train = self.to_matrix(self.df_train)
        self.valid = self.to_matrix(self.df_valid)
        self.test = self.to_matrix(self.df_test)
        self._finalize()
