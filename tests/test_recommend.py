"""Full-catalog top-k recommender tests."""

import numpy as np
import pytest
from scipy import sparse

from cymf_tpu import recommend


def test_recommend_orders_by_score():
    rng = np.random.default_rng(0)
    W = rng.normal(size=(20, 6))
    H = rng.normal(size=(40, 6))
    scores, items = recommend(W, H, k=5)
    full = W @ H.T
    for u in range(20):
        want = np.argsort(-full[u])[:5]
        np.testing.assert_array_equal(items[u], want)
        np.testing.assert_allclose(scores[u], full[u][want], rtol=1e-5)


def test_recommend_excludes_train_positives():
    rng = np.random.default_rng(1)
    W = rng.normal(size=(10, 4))
    H = rng.normal(size=(15, 4))
    X = sparse.random(10, 15, density=0.3, random_state=1, format="csr",
                      data_rvs=lambda n: np.ones(n))
    _, items = recommend(W, H, k=5, exclude=X)
    for u in range(10):
        seen = set(X[u].indices)
        assert not (set(items[u].tolist()) & seen)


def test_recommend_chunking_consistent():
    rng = np.random.default_rng(2)
    W = rng.normal(size=(33, 5))
    H = rng.normal(size=(21, 5))
    s1, i1 = recommend(W, H, k=3, user_chunk=7)
    s2, i2 = recommend(W, H, k=3, user_chunk=64)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_recommend_k_too_large():
    with pytest.raises(ValueError):
        recommend(np.ones((3, 2)), np.ones((4, 2)), k=10)
