"""Model save/load tests."""

import numpy as np
import pytest

from cymf_tpu import BPR, WMF
from cymf_tpu.dataset import SyntheticImplicitDataset


def test_save_load_roundtrip(tmp_path):
    d = SyntheticImplicitDataset(num_user=40, num_item=30, rank=3,
                                 density=0.2, seed=0)
    m = BPR(num_components=5, learning_rate=0.03, weight_decay=0.02,
            batch_size=64)
    m.fit(d.train, num_epochs=3, verbose=False)
    p = str(tmp_path / "m.npz")
    m.save(p)
    m2 = BPR.load(p)
    np.testing.assert_array_equal(m2.W, m.W)
    np.testing.assert_array_equal(m2.H, m.H)
    assert m2.num_components == 5
    assert m2.learning_rate == pytest.approx(0.03)
    assert m2.weight_decay == pytest.approx(0.02)


def test_save_load_warm_start(tmp_path):
    d = SyntheticImplicitDataset(num_user=40, num_item=30, rank=3,
                                 density=0.2, seed=0)
    m = WMF(num_components=4)
    m.fit(d.train, num_epochs=2, verbose=False)
    p = str(tmp_path / "w.npz")
    m.save(p)
    m2 = WMF.load(p)
    m2.fit(d.train, num_epochs=1, verbose=False)  # warm start continues
    assert np.isfinite(m2.W).all()


def test_save_unfit_raises(tmp_path):
    with pytest.raises(ValueError):
        BPR().save(str(tmp_path / "x.npz"))
