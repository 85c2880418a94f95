"""Golden tests for the metric formulas.

The reference metrics are non-standard (SURVEY.md §2 "Metrics"): DCG's slot 0
is undiscounted and unconditional, normalization is by positives in the
candidate list, IPS variants self-normalize.  Expected values below are
hand-computed from the formulas at `/root/reference/cymf/metrics.pyx`.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cymf_tpu.evaluation import metrics as M

Y = np.asarray([1, 0, 1, 0, 1], dtype=np.int32)  # 3 positives
P = np.asarray([0.5, 0.25, 0.5, 1.0, 0.125])


def test_dcg_hand_computed():
    # k=3: y[0] + y[1]/log2(2) + y[2]/log2(3); y[2]=1 -> 1 + 0 + 1/log2(3)
    want = (1.0 + 1.0 / np.log2(3.0)) / 3.0
    assert M.dcg_at_k(Y, 3) == pytest.approx(want)


def test_dcg_k1_counts_slot0_only():
    # slot 0 counted even with k=1 (loop 1<=i<k empty)
    assert M.dcg_at_k(Y, 1) == pytest.approx(1.0 / 3.0)
    assert M.dcg_at_k(np.asarray([0, 1, 1]), 1) == pytest.approx(0.0)


def test_dcg_no_positives_is_zero():
    assert M.dcg_at_k(np.zeros(5, np.int32), 3) == 0.0


def test_recall_hand_computed():
    assert M.recall_at_k(Y, 3) == pytest.approx(2.0 / 3.0)
    assert M.recall_at_k(Y, 5) == pytest.approx(1.0)


def test_map_hand_computed():
    # hits at ranks 1 and 3 within k=3: (1/1 + 2/3) / 3
    want = (1.0 + 2.0 / 3.0) / 3.0
    assert M.average_precision_at_k(Y, 3) == pytest.approx(want)


def test_dcg_ips_hand_computed():
    sn = (1 / 0.5 + 1 / 0.5 + 1 / 0.125)
    want = (1 / 0.5 + (1 / np.log2(3)) / 0.5) / sn
    assert M.dcg_at_k_with_ips(Y, P, 3) == pytest.approx(want)


def test_recall_ips_hand_computed():
    sn = (2.0 + 2.0 + 8.0)
    assert M.recall_at_k_with_ips(Y, P, 3) == pytest.approx(4.0 / sn)


def test_map_ips_hand_computed():
    sn = 12.0
    # sncum at rank1 = 2, at rank3 = 4
    want = (2.0 / 1.0 + 4.0 / 3.0) / sn
    assert M.average_precision_at_k_with_ips(Y, P, 3) == pytest.approx(want)


@pytest.mark.parametrize("k", [1, 2, 5, 10])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_batch_matches_scalar(seed, k):
    rng = np.random.default_rng(seed)
    L = 12
    labels = (rng.random((6, L)) < 0.3).astype(np.float64)
    props = rng.uniform(0.05, 1.0, size=(6, L))
    jl = jnp.asarray(labels)
    jp = jnp.asarray(props)

    pairs = [
        (M.dcg_at_k_batch(jl, k), [M.dcg_at_k(r, k) for r in labels]),
        (M.recall_at_k_batch(jl, k),
         [M.recall_at_k(r, k) for r in labels]),
        (M.average_precision_at_k_batch(jl, k),
         [M.average_precision_at_k(r, k) for r in labels]),
        (M.dcg_at_k_with_ips_batch(jl, jp, k),
         [M.dcg_at_k_with_ips(r, p, k) for r, p in zip(labels, props)]),
        (M.recall_at_k_with_ips_batch(jl, jp, k),
         [M.recall_at_k_with_ips(r, p, k) for r, p in zip(labels, props)]),
        (M.average_precision_at_k_with_ips_batch(jl, jp, k),
         [M.average_precision_at_k_with_ips(r, p, k)
          for r, p in zip(labels, props)]),
    ]
    for got, want in pairs:
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-7)
