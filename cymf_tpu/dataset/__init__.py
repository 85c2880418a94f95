"""Dataset loaders (API parity with `/root/reference/cymf/dataset/__init__.py`)."""

from .implicit import ImplicitFeedbackDataset
from .movielens import MovieLens
from .yahoomusic import YahooMusic
from .cooccurrence import CooccurrrenceDataset, CooccurrenceDataset
from .text8 import Text8
from .text import read_text
from .synthetic import SyntheticImplicitDataset, synthetic_interactions

__all__ = ["ImplicitFeedbackDataset", "MovieLens", "YahooMusic",
           "CooccurrrenceDataset", "CooccurrenceDataset", "Text8",
           "read_text", "SyntheticImplicitDataset", "synthetic_interactions"]
