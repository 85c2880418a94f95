"""Native (C++/OpenMP) BPR epoch-prep vs structural invariants and the
numpy fallback.  The two draw different RNG streams, so equality is
checked on everything EXCEPT the draws: permutation validity, sortedness,
row consistency, rejection-mask correctness, window ranges."""

import numpy as np
import pytest

from cymf_tpu.native import HAVE_NATIVE
from cymf_tpu.ops import packed as pk
from cymf_tpu.ops.packed_epoch import prep_epoch
from cymf_tpu.ops.sorted_accum import window_ranges

U, I, K, B, S = 3000, 900, 20, 2048, 3


def _inputs(seed=0):
    s = pk.num_slots(K)
    rh = pk.logical_rows(I, 128)  # H is stored in logical layout
    rng = np.random.default_rng(seed)
    u2 = np.sort(rng.integers(0, U, (S, B)).astype(np.int32), axis=1)
    i2 = rng.integers(0, I, (S, B)).astype(np.int32)
    pos_keys = np.sort(rng.integers(0, U * I, 20_000).astype(np.int64))
    return s, rh, u2, i2, pos_keys


def _validate(out, u2, i2, pos_keys, s, rh):
    j2, mask, sj, rowsj, winj = out
    for t in range(S):
        perm = sj[t]
        assert np.array_equal(np.sort(perm), np.arange(B))
        ph_sorted = j2[t][perm]  # logical H: target row IS the item id
        assert (np.diff(ph_sorted) >= 0).all()
        assert (rowsj[t].ravel() == ph_sorted).all()
        keys = u2[t].astype(np.int64) * I + j2[t]
        idx = np.minimum(np.searchsorted(pos_keys, keys), len(pos_keys) - 1)
        collide = pos_keys[idx] == keys
        expect = ((u2[t] < U) & ~collide).astype(np.float32)
        assert (mask[t] == expect).all()
        st, ct = window_ranges(ph_sorted, rh, 128, 1024, align=128)
        assert (winj[t, 0] == st).all() and (winj[t, 1] == ct).all()


def test_numpy_prep_invariants():
    s, rh, u2, i2, pos_keys = _inputs()
    out = prep_epoch(np.random.default_rng(5), u2, i2, pos_keys, U, I, K,
                     rh, 128)
    _validate(out, u2, i2, pos_keys, s, rh)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_prep_invariants():
    s, rh, u2, i2, pos_keys = _inputs()
    out = prep_epoch(None, u2, i2, pos_keys, U, I, K, rh, 128,
                     native_seed=5)
    _validate(out, u2, i2, pos_keys, s, rh)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_prep_deterministic():
    _, rh, u2, i2, pos_keys = _inputs()
    a = prep_epoch(None, u2, i2, pos_keys, U, I, K, rh, 128, native_seed=9)
    b = prep_epoch(None, u2, i2, pos_keys, U, I, K, rh, 128, native_seed=9)
    c = prep_epoch(None, u2, i2, pos_keys, U, I, K, rh, 128, native_seed=10)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
    assert not np.array_equal(a[0], c[0])


def test_prep_static_invariants():
    from cymf_tpu.ops.packed_epoch import prep_static
    s, rh, u2, i2, pos_keys = _inputs()
    rw = pk.packed_rows(U, K, 128)
    winw, wstart, si, rowsi, wini, bcs, bcn, kernel_v = prep_static(
        u2, i2, K, rw, rh, 128, 128)
    for t in range(S):
        perm = si[t]
        assert np.array_equal(np.sort(perm), np.arange(B))
        ph_sorted = i2[t][perm]  # logical H: target row IS the item id
        assert (np.diff(ph_sorted) >= 0).all()
        assert (rowsi[t].ravel() == ph_sorted).all()
        st, ct = window_ranges(ph_sorted, rh, 128, 1024, align=128)
        assert (wini[t, 0] == st).all() and (wini[t, 1] == ct).all()
        pu = u2[t] // s
        st, ct = window_ranges(pu, rw, 128, 1024, align=128)
        assert (winw[t, 0] == st).all() and (winw[t, 1] == ct).all()


def test_prep_backend_env_override(monkeypatch):
    """CYMF_TPU_PREP=numpy forces the portable stream even when the
    native extension is built, and prep_epoch honors it."""
    from cymf_tpu.ops.packed_epoch import prep_backend
    monkeypatch.setenv("CYMF_TPU_PREP", "numpy")
    assert prep_backend() == "numpy"
    s, rh, u2, i2, pos_keys = _inputs()
    rng = np.random.default_rng((11, 0))
    out = prep_epoch(rng, u2, i2, pos_keys, U, I, K, rh, 128,
                     native_seed=1234)
    rng2 = np.random.default_rng((11, 0))
    ref = prep_epoch(rng2, u2, i2, pos_keys, U, I, K, rh, 128,
                     native_seed=None)
    for a, b in zip(out, ref):
        assert np.array_equal(a, b)
    monkeypatch.delenv("CYMF_TPU_PREP")
    assert prep_backend() in ("native", "numpy")


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_prep_validates_inputs():
    """Malformed arguments raise ValueError before the OpenMP region."""
    from cymf_tpu.native import _native
    s, rh, u2, i2, pos_keys = _inputs()
    u2c = np.ascontiguousarray(u2, np.int32)
    keys = np.ascontiguousarray(pos_keys, np.int64)
    with pytest.raises(ValueError):  # u2 length != S*B
        _native.bpr_prep_epoch_v2(u2c[:, :-1].copy(), keys, S, B, U, I,
                                  1, rh, 128, 1024, 1)
    with pytest.raises(ValueError):  # I <= 0 (UB in the distribution)
        _native.bpr_prep_epoch_v2(u2c, keys, S, B, U, 0, 1, rh, 128,
                                  1024, 1)
    with pytest.raises(ValueError):  # rh not a multiple of wrows
        _native.bpr_prep_epoch_v2(u2c, keys, S, B, U, I, 1, rh, 100,
                                  1024, 1)
    with pytest.raises(ValueError):  # rh too small for the catalog
        _native.bpr_prep_epoch_v2(u2c, keys, S, B, U, I, 1, 128, 128,
                                  1024, 1)
    with pytest.raises(ValueError):  # misaligned pos_keys bytes
        _native.bpr_prep_epoch_v2(u2c, keys.view(np.uint8)[:-4].copy(),
                                  S, B, U, I, 1, rh, 128, 1024, 1)


def test_pool_reject_matches_numpy():
    """Native pool_reject == the numpy rejection path bit-for-bit (the
    numpy PCG64 stream stays pool mode's only RNG; the native helper
    accelerates membership only)."""
    import os

    import numpy as np

    from cymf_tpu.native import HAVE_NATIVE, _native
    from cymf_tpu.ops.packed_epoch import _reject_mask

    if not (HAVE_NATIVE and hasattr(_native, "pool_reject")):
        import pytest
        pytest.skip("native extension not built")

    rng = np.random.default_rng(3)
    S, B, U, I = 2, 1024, 200, 150
    u2 = np.sort(rng.integers(0, U + 30, (S, B)).astype(np.int32), axis=1)
    j2 = rng.integers(0, I, (S, B)).astype(np.int32)
    pos_keys = np.unique(
        rng.integers(0, U, 900).astype(np.int64) * I
        + rng.integers(0, I, 900))

    m_native = _reject_mask(u2, j2, pos_keys, U, I)
    old = os.environ.get("CYMF_TPU_PREP")
    os.environ["CYMF_TPU_PREP"] = "numpy"
    try:
        m_numpy = _reject_mask(u2, j2, pos_keys, U, I)
    finally:
        if old is None:
            os.environ.pop("CYMF_TPU_PREP", None)
        else:
            os.environ["CYMF_TPU_PREP"] = old
    np.testing.assert_array_equal(m_native, m_numpy)
    assert 0 < m_native.mean() < 1  # rejections and padding both present

    # empty key set: only the in-data predicate applies
    m_empty = _reject_mask(u2, j2, np.empty(0, np.int64), U, I)
    np.testing.assert_array_equal(m_empty, (u2 < U).astype(np.float32))

    # malformed buffers raise instead of reading out of bounds
    import pytest
    with pytest.raises(ValueError):
        _native.pool_reject(u2[:, :100].tobytes(), j2.tobytes(),
                            pos_keys.tobytes(), u2.size, U, I)


def test_prep_epoch_v3_bit_identical_to_v2():
    """Filter-accelerated native prep (v3) must reproduce v2's outputs
    exactly: same mt19937 per-step streams, same masks, sorts, windows."""
    import numpy as np

    from cymf_tpu.native import HAVE_NATIVE, _native
    from cymf_tpu.ops.packed_epoch import make_reject_filter, prep_epoch

    if not (HAVE_NATIVE and hasattr(_native, "bpr_prep_epoch_v3")):
        import pytest
        pytest.skip("native extension not built")

    rng = np.random.default_rng(2)
    U, I, K, S, B = 300, 200, 20, 2, 2048
    u2 = np.sort(rng.integers(0, U + 20, (S, B)).astype(np.int32), axis=1)
    i2 = rng.integers(0, I, (S, B)).astype(np.int32)
    rh = 512
    pos_keys = np.unique(
        rng.integers(0, U, 1500).astype(np.int64) * I
        + rng.integers(0, I, 1500))
    kf = make_reject_filter(pos_keys, U, I)
    a = prep_epoch(np.random.default_rng(1), u2, i2, pos_keys, U, I, K,
                   rh, 512, native_seed=77)
    b = prep_epoch(np.random.default_rng(1), u2, i2, pos_keys, U, I, K,
                   rh, 512, native_seed=77, key_filter=kf)
    for x, y, name in zip(a, b, ("j2", "mask", "sj", "rowsj", "winj")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)
    assert np.asarray(a[1]).min() == 0 and np.asarray(a[1]).mean() > 0.5


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_relmf_prep_invariants():
    """`_native.relmf_prep_epoch` (round 4): exact labels vs searchsorted
    on its own drawn stream, u-sorted order, valid i-side permutation,
    and window coverage on both sides."""
    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.packed_epoch import make_reject_filter
    from cymf_tpu.ops.relmf_epoch import prep_relmf_epoch

    U, I, K, B, S = 610, 370, 12, 1024, 3
    wrows = 16
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, U * I, 8000).astype(np.int64))
    kf = make_reject_filter(keys, U, I)
    assert kf is not None
    rw = pk.packed_rows(U, K, multiple=wrows)
    rh = pk.logical_rows(I, multiple=wrows)
    u2, i2, lab, winw, si, rowsi, wini = prep_relmf_epoch(
        7, 0, S, B, U, I, K, rw, rh, wrows, wrows, keys, key_filter=kf)
    s = pk.num_slots(K)
    assert (np.diff(u2.astype(np.int64) // s, axis=1) >= 0).all()
    kk = u2.astype(np.int64) * I + i2
    idx = np.minimum(np.searchsorted(keys, kk), len(keys) - 1)
    np.testing.assert_array_equal(lab, (keys[idx] == kk).astype(np.uint8))
    for t in range(S):
        assert np.array_equal(np.sort(si[t]), np.arange(B))
        srt = i2[t][si[t]]
        assert (np.diff(srt) >= 0).all()
        np.testing.assert_array_equal(rowsi[t].ravel(), srt)
        pu = u2[t].astype(np.int64) // s
        for w in range(rw // wrows):
            inw = np.nonzero((pu >= w * wrows) & (pu < (w + 1) * wrows))[0]
            if len(inw):
                a, c = winw[t, 0, w], winw[t, 1, w]
                assert a <= inw[0] and inw[-1] < a + c
        for w in range(rh // wrows):
            inw = np.nonzero((srt >= w * wrows)
                             & (srt < (w + 1) * wrows))[0]
            if len(inw):
                a, c = wini[t, 0, w], wini[t, 1, w]
                assert a <= inw[0] and inw[-1] < a + c
