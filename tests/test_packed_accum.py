"""Tests for the packed-table layout and the Pallas sorted accumulation
kernel (interpret mode on CPU; the real-TPU path is exercised by bench.py
and the packed BPR engine parity tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cymf_tpu.ops import packed as pk
from cymf_tpu.ops.sorted_accum import (pad_samples, sorted_accum,
                                       sorted_accum_reference, window_ranges)


class TestPacked:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        for N, K in [(100, 20), (7, 64), (50, 33), (12, 128), (30, 100)]:
            t = rng.normal(size=(N, K)).astype(np.float32)
            p = pk.pack_array(t, K)
            assert p.shape[1] == 128 and p.shape[0] % 8 == 0
            np.testing.assert_array_equal(pk.unpack_array(p, N, K), t)

    def test_dead_lanes_zero(self):
        t = np.ones((10, 20), np.float32)
        p = pk.pack_array(t, 20)
        assert (p[:, 120:] == 0).all()  # 6 slots * 20 lanes used

    def test_extract_place_inverse(self):
        rng = np.random.default_rng(1)
        K, N, B = 20, 90, 64
        t = rng.normal(size=(N, K)).astype(np.float32)
        p = jnp.asarray(pk.pack_array(t, K))
        rows = rng.integers(0, N, B)
        phys, slot = pk.split_index(jnp.asarray(rows, jnp.int32), K)
        got = pk.extract_rows(p[phys], slot, K)
        np.testing.assert_array_equal(np.asarray(got), t[rows])
        placed = pk.place_rows(got, slot, K)
        # placing then extracting returns the original logical rows
        back = pk.extract_rows(placed, slot, K)
        np.testing.assert_array_equal(np.asarray(back), t[rows])
        # every other lane is zero
        s = pk.num_slots(K)
        for b in range(8):
            o = int(slot[b])
            m = np.ones(128, bool)
            m[o * K:(o + 1) * K] = False
            assert (np.asarray(placed)[b][m] == 0).all()

    def test_slot_mask_per_logical_row(self):
        K = 20
        g = np.zeros((8, 128), np.float32)
        g[2, 45] = 1.0  # slot 2 of physical row 2 (lanes 40..59)
        mask = np.asarray(pk.slot_mask(jnp.asarray(g), K))
        assert mask[2, 40:60].all()
        assert not mask[2, :40].any() and not mask[2, 60:].any()
        assert not mask[0].any()
        assert not mask[:, 120:].any()  # dead lanes never touched


class TestSortedAccum:
    @pytest.mark.parametrize("B,R,wrows", [(3000, 1024, 256),
                                           (500, 2048, 512),
                                           (10000, 512, 128)])
    def test_matches_scatter(self, B, R, wrows):
        rng = np.random.default_rng(B)
        rows = np.sort(rng.integers(0, R - 5, B)).astype(np.int32)
        g = rng.normal(size=(B, 128)).astype(np.float32)
        starts, counts = window_ranges(rows, R, wrows)
        rows2d = pad_samples(rows, R)
        g_p = np.zeros((rows2d.size, 128), np.float32)
        g_p[:B] = g
        out = sorted_accum(jnp.asarray(rows2d), jnp.asarray(g_p),
                           jnp.asarray(starts), jnp.asarray(counts),
                           r_pad=R, wrows=wrows, interpret=True)
        ref = sorted_accum_reference(jnp.asarray(rows), jnp.asarray(g), R)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_heavy_duplicates(self):
        """All samples on 3 rows — duplicates must combine exactly."""
        B, R = 4096, 512
        rows = np.sort(np.random.default_rng(0).integers(100, 103, B)) \
            .astype(np.int32)
        g = np.ones((B, 128), np.float32)
        starts, counts = window_ranges(rows, R, 128)
        rows2d = pad_samples(rows, R)
        g_p = np.zeros((rows2d.size, 128), np.float32)
        g_p[:B] = g
        out = np.asarray(sorted_accum(
            jnp.asarray(rows2d), jnp.asarray(g_p), jnp.asarray(starts),
            jnp.asarray(counts), r_pad=R, wrows=128, interpret=True))
        counts_per_row = np.bincount(rows, minlength=R)
        np.testing.assert_allclose(out[:, 0], counts_per_row)

    @pytest.mark.parametrize("U,K,wrows,want_v,precision,rtol,atol", [
        # engine_version is DATA-dependent: U=300/wrows=128 -> rw=128 <
        # CROWS but spans fit the whole-table window -> v5; U=1200 dense
        # -> all chunk spans fit 264 rows -> the v6 fused block kernel;
        # U=12000 SPARSE (1024 samples over 2000 packed rows) -> chunk
        # spans overrun any expansion window -> v4 (a sparse batch run
        # through v5/v6 would silently train on zero W rows — the gate
        # is the regression test here; v7, the fused span-independent
        # variant, measured SLOWER than v4 on hardware in round 4 and
        # is now force-only — covered by the @7 cases below);
        # K=31 (s*(K+1)=128, no free loss lane) -> the v4 fallback.
        (300, 20, 128, 5, "highest", 2e-4, 2e-5),
        (300, 20, 128, 5, "split", 8e-4, 8e-5),
        (1200, 20, 512, 6, "highest", 2e-4, 2e-5),
        (1200, 20, 512, 6, "split", 8e-4, 8e-5),
        (12000, 20, 512, 4, "highest", 2e-4, 2e-5),
        (12000, 20, 512, 7, "highest", 2e-4, 2e-5),
        (12000, 20, 512, 7, "split", 8e-4, 8e-5),
        (12000, 31, 512, 4, "split", 8e-4, 8e-5),
    ])
    def test_packed_epoch_matches_dense_reference(self, U, K, wrows, want_v,
                                                  precision, rtol, atol,
                                                  monkeypatch):
        if want_v == 7:  # force-only since round 4 (slower than v4)
            monkeypatch.setenv("CYMF_TPU_PACKED_KERNEL", "7")
        """packed_bpr_epoch == an unpacked gather/scatter/sparse-Adam
        replica on identical (u, i, j, mask) streams."""
        from cymf_tpu.ops import packed as pk
        from cymf_tpu.ops.packed_epoch import (engine_version,
                                               packed_bpr_epoch, prep_epoch,
                                               prep_static, unpack_device)

        rng = np.random.default_rng(3)
        I, B, S = 200, 1024, 2  # B must be a TILE multiple
        lr, wd = 0.02, 0.01
        W0 = rng.normal(size=(U, K)).astype(np.float32) * 0.1
        H0 = rng.normal(size=(I, K)).astype(np.float32) * 0.1
        u2 = np.sort(rng.integers(0, U, (S, B)).astype(np.int32), axis=1)
        i2 = rng.integers(0, I, (S, B)).astype(np.int32)

        rw = pk.packed_rows(U, K, multiple=wrows)
        rh = pk.logical_rows(I, multiple=wrows)
        assert engine_version(K, rw, wrows, u2=u2) == want_v
        winw, wstart, si, rowsi, wini, bcs, bcn, kernel_v = prep_static(
            u2, i2, K, rw, rh, wrows, wrows)
        assert kernel_v == want_v
        pos_keys = np.sort(
            u2.ravel().astype(np.int64) * I + i2.ravel())
        j2, mask, sj, rowsj, winj = prep_epoch(
            np.random.default_rng(9), u2, i2, pos_keys, U, I, K, rh, wrows)

        Wp = jnp.asarray(pk.pack_array(W0, K, multiple=wrows))
        Hp = jnp.asarray(pk.pack_logical(H0, K, multiple=wrows))
        from cymf_tpu.ops.packed_epoch import make_packed_optimizer
        opt = make_packed_optimizer("adam", lr)
        Wp2, Hp2, _, _, loss = packed_bpr_epoch(
            Wp, Hp, opt.init(Wp), opt.init(Hp),
            jnp.asarray(u2), jnp.asarray(i2), jnp.asarray(si),
            jnp.asarray(rowsi), jnp.asarray(wini), jnp.asarray(j2),
            jnp.asarray(mask), jnp.asarray(sj), jnp.asarray(rowsj),
            jnp.asarray(winj), jnp.asarray(winw), jnp.asarray(wstart),
            jnp.asarray(bcs), jnp.asarray(bcn),
            jnp.asarray(S * B), opt_name="adam", lr=lr, weight_decay=wd,
            K=K, rw=rw, rh=rh, wrows_w=wrows, wrows_h=wrows,
            interpret=True, precision=precision, kernel_v=kernel_v)
        W_got = np.asarray(unpack_device(Wp2, K))[:U]
        H_got = np.asarray(Hp2[:I, :K])

        # ---- unpacked replica: sparse-Adam where a row is touched iff at
        # least one live (unmasked) sample hit it — the count-channel
        # semantics, matching the reference's per-sampled-element updates
        # (`optimizer.pyx:150-160` runs for every non-skipped sample)
        def adam_dense(T, m, v, gbuf, touched):
            touched = touched[:, None] > 0
            m2 = np.where(touched, 0.9 * m + 0.1 * gbuf, m)
            v2 = np.where(touched, 0.999 * v + 0.001 * gbuf**2, v)
            delta = np.where(
                touched, -lr * (m2 / 0.1) / (np.sqrt(v2 / 0.001) + 1e-8), 0)
            return T + delta, m2, v2

        W, H = W0.copy(), H0.copy()
        mW = np.zeros_like(W); vW = np.zeros_like(W)
        mH = np.zeros_like(H); vH = np.zeros_like(H)
        for t in range(S):
            u, i, j, mf = u2[t], i2[t], j2[t], mask[t][:, None]
            wu, hi, hj = W[u], H[i], H[j]
            x = np.sum(wu * (hi - hj), axis=1, keepdims=True)
            sig = 1.0 / (1.0 + np.exp(x))
            g_wu = -(sig * (hi - hj) - wd * wu) * mf
            g_hi = -(sig * wu - wd * hi) * mf
            g_hj = -(-sig * wu - wd * hj) * mf
            gW = np.zeros_like(W); np.add.at(gW, u, g_wu)
            gH = np.zeros_like(H); np.add.at(gH, i, g_hi)
            np.add.at(gH, j, g_hj)
            cW = np.zeros(U); np.add.at(cW, u, mask[t])
            cH = np.zeros(I); np.add.at(cH, i, mask[t])
            np.add.at(cH, j, mask[t])
            W, mW, vW = adam_dense(W, mW, vW, gW, cW)
            H, mH, vH = adam_dense(H, mH, vH, gH, cH)

        np.testing.assert_allclose(W_got, W, rtol=rtol, atol=atol)
        np.testing.assert_allclose(H_got, H, rtol=rtol, atol=atol)

    def test_fit_packed_on_learns(self):
        """The public BPR.fit packed path (packed='on', interpret mode)
        trains: loss decreases and ranking beats random."""
        import scipy.sparse as sp

        from cymf_tpu import BPR
        from cymf_tpu.evaluation import AoaEvaluator

        rng = np.random.default_rng(0)
        U, I, rank = 150, 90, 4
        scores = rng.normal(size=(U, rank)) @ rng.normal(size=(rank, I))
        X = sp.csr_matrix((scores > np.quantile(scores, 0.9)).astype(
            np.float64))
        m = BPR(num_components=8, learning_rate=0.05, weight_decay=0.0,
                packed="on", batch_size=1024)
        m.fit(X, num_epochs=3, verbose=False)
        first_loss = m.last_loss
        m.fit(X, num_epochs=3, verbose=False)  # warm start continues
        assert m.last_loss < first_loss
        ev = AoaEvaluator(X, metrics=["DCG"], k=5, num_negatives=50)
        got = ev.evaluate(m.W, m.H)["DCG@5"]
        assert got > 0.3

    def test_empty_input(self):
        rows = np.zeros(0, np.int32)
        starts, counts = window_ranges(rows, 256, 128)
        rows2d = pad_samples(rows, 256)
        g_p = np.zeros((rows2d.size, 128), np.float32)
        out = np.asarray(sorted_accum(
            jnp.asarray(rows2d), jnp.asarray(g_p), jnp.asarray(starts),
            jnp.asarray(counts), r_pad=256, wrows=128, interpret=True))
        assert (out == 0).all()


class TestFusedSamplePhase:
    @pytest.mark.parametrize("K", [20, 33, 64, 100])
    def test_matches_xla_composition(self, K):
        """bpr_sample_phase (interpret) == extract/score/place in jnp.

        W is packed (decorated gather); H is logical (raw gather, payload
        lanes [0, K), zeros elsewhere) — the v4 layout asymmetry."""
        from cymf_tpu.ops.fused_sample import bpr_sample_phase, decorate

        rng = np.random.default_rng(K)
        U, I, B = 97, 61, 2048
        s = pk.num_slots(K)
        rw = pk.packed_rows(U, K)
        Wp = jnp.asarray(rng.normal(size=(rw, 128)).astype(np.float32))
        Hn = rng.normal(size=(I, K)).astype(np.float32)
        Hl = jnp.asarray(pk.pack_logical(Hn, K))
        u = jnp.asarray(rng.integers(0, U, B).astype(np.int32))
        i = jnp.asarray(rng.integers(0, I, B).astype(np.int32))
        j = jnp.asarray(rng.integers(0, I, B).astype(np.int32))
        mf = jnp.asarray((rng.random(B) > 0.2).astype(np.float32))
        wd = 0.013

        Du = decorate(Wp[u // s], u % s, mf, K)
        SW, Q, lossp = bpr_sample_phase(Du, Hl[i], Hl[j], K=K, wd=wd,
                                        interpret=True, tile=1024)

        # jnp reference — the packed engine's original XLA step
        wu = pk.extract_rows(Wp[u // s], u % s, K) * mf[:, None]
        hi = jnp.asarray(Hn)[i]
        hj = jnp.asarray(Hn)[j]
        x = jnp.sum(wu * (hi - hj), axis=1, keepdims=True)
        sig = jax.nn.sigmoid(-x[:, 0])[:, None]
        l2 = (jnp.sum(jnp.square(wu), axis=1)
              + jnp.sum(jnp.square(hi), axis=1)
              + jnp.sum(jnp.square(hj), axis=1))
        loss_ref = jnp.sum(
            (-jax.nn.log_sigmoid(x[:, 0]) + wd * l2) * mf)
        SW_ref = pk.place_with_count(sig * (hi - hj), mf, u % s, K)
        # Q: compact sig*wu (mask folded into wu), mask at lane K
        Q_ref = np.zeros((B, 128), np.float32)
        Q_ref[:, :K] = np.asarray(sig * wu)
        Q_ref[:, K] = np.asarray(mf)

        m = np.asarray(mf)[:, None]
        np.testing.assert_allclose(np.asarray(SW) * m,
                                   np.asarray(SW_ref) * m,
                                   rtol=1e-5, atol=1e-6)
        # masked samples contribute exactly zero rows
        np.testing.assert_array_equal(np.asarray(SW) * (1 - m), 0.0)
        np.testing.assert_allclose(np.asarray(Q), Q_ref,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(lossp[0, 0]),
                                   float(loss_ref), rtol=1e-5)
        # everything but (0,0) stays zero
        assert float(jnp.sum(jnp.abs(lossp))) == float(jnp.abs(lossp[0, 0]))


class TestSortedAccumDual:
    @pytest.mark.parametrize("Bi,Bj,R,wrows,neg_lanes",
                             [(3000, 3000, 1024, 256, 20),
                              (2000, 5000, 512, 128, 50)])
    def test_matches_two_scatters(self, Bi, Bj, R, wrows, neg_lanes):
        """dual == scatter(j) - scatter(i) on payload lanes, + on the
        rest (the count channel)."""
        from cymf_tpu.ops.sorted_accum import sorted_accum_dual

        rng = np.random.default_rng(Bi + Bj)
        ri = np.sort(rng.integers(0, R - 5, Bi)).astype(np.int32)
        rj = np.sort(rng.integers(0, R - 5, Bj)).astype(np.int32)
        gi = rng.normal(size=(Bi, 128)).astype(np.float32)
        gj = rng.normal(size=(Bj, 128)).astype(np.float32)
        args = []
        for rows, g in ((ri, gi), (rj, gj)):
            starts, counts = window_ranges(rows, R, wrows)
            rows2d = pad_samples(rows, R)
            g_p = np.zeros((rows2d.size, 128), np.float32)
            g_p[:len(g)] = g
            args += [jnp.asarray(rows2d), jnp.asarray(g_p),
                     jnp.asarray(starts), jnp.asarray(counts)]
        out = np.asarray(sorted_accum_dual(
            *args, r_pad=R, neg_lanes=neg_lanes, wrows=wrows,
            interpret=True))
        ai = np.asarray(sorted_accum_reference(jnp.asarray(ri),
                                               jnp.asarray(gi), R))
        aj = np.asarray(sorted_accum_reference(jnp.asarray(rj),
                                               jnp.asarray(gj), R))
        ref = aj.copy()
        ref[:, :neg_lanes] -= ai[:, :neg_lanes]
        ref[:, neg_lanes:] += ai[:, neg_lanes:]
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


class TestSamplePhaseV5:
    def test_matches_v4(self):
        """bpr_sample_phase_v5 (in-kernel W expansion, j-side decoration)
        == bpr_sample_phase (XLA W gather, u-side decoration)."""
        from cymf_tpu.ops import packed as pk
        from cymf_tpu.ops.fused_sample import (bpr_sample_phase,
                                               bpr_sample_phase_v5,
                                               decorate)
        from cymf_tpu.ops.packed_epoch import _fold_rows

        rng = np.random.default_rng(4)
        U, I, K, B = 290, 170, 20, 1024
        wd = 0.013
        s = pk.num_slots(K)
        Wp = jnp.asarray(pk.pack_array(
            rng.normal(size=(U, K)).astype(np.float32) * 0.2, K,
            multiple=8))
        Hl = jnp.asarray(pk.pack_logical(
            rng.normal(size=(I, K)).astype(np.float32) * 0.2, K,
            multiple=8))
        u = np.sort(rng.integers(0, U, B).astype(np.int32))
        i = rng.integers(0, I, B).astype(np.int32)
        j = rng.integers(0, I, B).astype(np.int32)
        mf = (rng.random(B) > 0.1).astype(np.float32)
        phys, slot = (u // s).astype(np.int32), (u % s).astype(np.int32)

        Du = decorate(Wp[phys], jnp.asarray(slot), jnp.asarray(mf), K)
        SW4, Q4, L4 = bpr_sample_phase(Du, Hl[i], Hl[j], K=K, wd=wd,
                                       interpret=True)

        from cymf_tpu.ops.fused_sample import TILE, WROWS_A
        nT = B // TILE
        wrows_a = min(WROWS_A, Wp.shape[0])
        wstart = np.clip(phys[::TILE], 0,
                         max(Wp.shape[0] - wrows_a, 0)).astype(np.int32)
        Dj = decorate(Hl[j], jnp.asarray(slot), jnp.asarray(mf), K)
        SW5, Q5, L5 = bpr_sample_phase_v5(
            Wp, jnp.asarray(wstart), _fold_rows(jnp.asarray(phys)),
            Hl[i], Dj, K=K, wd=wd, interpret=True)
        np.testing.assert_allclose(np.asarray(SW5), np.asarray(SW4),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(Q5), np.asarray(Q4),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(L5[0, 0], L4[0, 0], rtol=1e-3)


class TestWideEpoch:
    def test_wide_epoch_matches_dense_reference(self):
        """wide_bpr_epoch (K >= 128) == an unpacked gather/scatter/
        sparse-Adam replica on identical (u, i, j, mask) streams."""
        from cymf_tpu.ops.packed_epoch import prep_epoch
        from cymf_tpu.ops.wide_epoch import (pack_wide, prep_static_wide,
                                             wide_bpr_epoch, wide_rows,
                                             wide_sorted_masks)
        from cymf_tpu.ops.packed_epoch import make_packed_optimizer

        rng = np.random.default_rng(3)
        U, I, K, B, S = 300, 200, 160, 1024, 2
        lr, wd = 0.02, 0.01
        W0 = rng.normal(size=(U, K)).astype(np.float32) * 0.1
        H0 = rng.normal(size=(I, K)).astype(np.float32) * 0.1
        u2 = np.sort(rng.integers(0, U, (S, B)).astype(np.int32), axis=1)
        i2 = rng.integers(0, I, (S, B)).astype(np.int32)

        wrows = 128
        rw, rh = wide_rows(U, wrows), wide_rows(I, wrows)
        rowsu, winw, si, rowsi, wini = prep_static_wide(u2, i2, rw, rh,
                                                        wrows)
        pos_keys = np.sort(u2.ravel().astype(np.int64) * I + i2.ravel())
        j2, mask, sj, rowsj, winj = prep_epoch(
            np.random.default_rng(9), u2, i2, pos_keys, U, I, K, rh, wrows)
        mi2, mj2 = wide_sorted_masks(mask, si, sj)

        Wd = jnp.asarray(pack_wide(W0, K, multiple=wrows))
        Hd = jnp.asarray(pack_wide(H0, K, multiple=wrows))
        opt = make_packed_optimizer("adam", lr)
        W2, H2, _, _, loss = wide_bpr_epoch(
            Wd, Hd, opt.init(Wd), opt.init(Hd),
            jnp.asarray(u2), jnp.asarray(i2), jnp.asarray(rowsu),
            jnp.asarray(winw), jnp.asarray(si), jnp.asarray(rowsi),
            jnp.asarray(wini), jnp.asarray(j2), jnp.asarray(mask),
            jnp.asarray(sj), jnp.asarray(rowsj), jnp.asarray(winj),
            jnp.asarray(mi2), jnp.asarray(mj2),
            jnp.asarray(S * B), opt_name="adam", lr=lr, weight_decay=wd,
            K=K, rw=rw, rh=rh, wrows=wrows, interpret=True,
            precision="split")
        W_got = np.asarray(W2[:U, :K])
        H_got = np.asarray(H2[:I, :K])

        def adam_dense(T, m, v, gbuf, touched):
            touched = touched[:, None] > 0
            m2 = np.where(touched, 0.9 * m + 0.1 * gbuf, m)
            v2 = np.where(touched, 0.999 * v + 0.001 * gbuf**2, v)
            delta = np.where(
                touched, -lr * (m2 / 0.1) / (np.sqrt(v2 / 0.001) + 1e-8),
                0)
            return T + delta, m2, v2

        W, H = W0.copy(), H0.copy()
        mW = np.zeros_like(W); vW = np.zeros_like(W)
        mH = np.zeros_like(H); vH = np.zeros_like(H)
        total_loss = 0.0
        for t in range(S):
            u, i, j, mf = u2[t], i2[t], j2[t], mask[t][:, None]
            wu, hi, hj = W[u], H[i], H[j]
            x = np.sum(wu * (hi - hj), axis=1, keepdims=True)
            sig = 1.0 / (1.0 + np.exp(x))
            l2 = np.sum(wu**2 + hi**2 + hj**2, axis=1)
            # -log sigmoid(x) = log1p(exp(-|x|)) + max(-x, 0)
            total_loss += float(np.sum(
                (np.log1p(np.exp(-np.abs(x[:, 0]))) +
                 np.maximum(-x[:, 0], 0) + wd * l2) * mask[t]))
            g_wu = -(sig * (hi - hj) - wd * wu) * mf
            g_hi = -(sig * wu - wd * hi) * mf
            g_hj = -(-sig * wu - wd * hj) * mf
            gW = np.zeros_like(W); np.add.at(gW, u, g_wu)
            gH = np.zeros_like(H); np.add.at(gH, i, g_hi)
            np.add.at(gH, j, g_hj)
            cW = np.zeros(U); np.add.at(cW, u, mask[t])
            cH = np.zeros(I); np.add.at(cH, i, mask[t])
            np.add.at(cH, j, mask[t])
            W, mW, vW = adam_dense(W, mW, vW, gW, cW)
            H, mH, vH = adam_dense(H, mH, vH, gH, cH)

        np.testing.assert_allclose(W_got, W, rtol=8e-4, atol=8e-5)
        np.testing.assert_allclose(H_got, H, rtol=8e-4, atol=8e-5)
        np.testing.assert_allclose(float(loss), total_loss / (S * B),
                                   rtol=1e-3)

    def test_fit_wide_on_learns(self):
        """The public BPR.fit wide path (packed='on', K >= 128,
        interpret mode) trains end to end."""
        import scipy.sparse as sp

        from cymf_tpu import BPR
        from cymf_tpu.evaluation import AoaEvaluator

        rng = np.random.default_rng(0)
        U, I, rank = 150, 90, 4
        scores = rng.normal(size=(U, rank)) @ rng.normal(size=(rank, I))
        X = sp.csr_matrix((scores > np.quantile(scores, 0.9)).astype(
            np.float64))
        m = BPR(num_components=128, learning_rate=0.05, weight_decay=0.0,
                packed="on", batch_size=1024)
        m.fit(X, num_epochs=3, verbose=False)
        first_loss = m.last_loss
        m.fit(X, num_epochs=3, verbose=False)  # warm start continues
        assert m.last_loss < first_loss
        ev = AoaEvaluator(X, metrics=["DCG"], k=5, num_negatives=50)
        got = ev.evaluate(m.W, m.H)["DCG@5"]
        assert got > 0.3


class TestCountLanes:
    def test_count_lanes_matches_explicit_granule(self):
        """sorted_accum(count_lanes=True) on payload-only streams with
        sentinel-routed masked rows == the explicit count-granule
        composition (the round-3 wide layout)."""
        from cymf_tpu.ops.sorted_accum import (pad_samples, sorted_accum,
                                               window_ranges)

        rng = np.random.default_rng(5)
        B, R, wrows, W_in = 3000, 1024, 256, 256
        rows = np.sort(rng.integers(0, R - 5, B)).astype(np.int32)
        mask = (rng.random(B) > 0.2).astype(np.float32)
        g = rng.normal(size=(B, W_in)).astype(np.float32) * mask[:, None]
        starts, counts = window_ranges(rows, R, wrows)
        rows2d = pad_samples(rows, R)
        rows_m = rows2d.copy().reshape(-1)
        rows_m[:B] = np.where(mask > 0, rows, R)
        rows_m = rows_m.reshape(rows2d.shape)
        g_p = np.zeros((rows2d.size, W_in), np.float32)
        g_p[:B] = g
        out = np.asarray(sorted_accum(
            jnp.asarray(rows_m), jnp.asarray(g_p), jnp.asarray(starts),
            jnp.asarray(counts), r_pad=R, wrows=wrows, interpret=True,
            count_lanes=True))
        assert out.shape == (R, W_in + 128)
        # reference: scatter payload + bincount of live rows
        ref_pay = np.zeros((R, W_in), np.float32)
        np.add.at(ref_pay, rows, g)
        ref_cnt = np.zeros(R, np.float32)
        np.add.at(ref_cnt, rows, mask)
        np.testing.assert_allclose(out[:, :W_in], ref_pay, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(out[:, W_in], ref_cnt)
        assert (out[:, W_in + 1:] == 0).all()

    def test_dual_count_lanes(self):
        from cymf_tpu.ops.sorted_accum import (pad_samples,
                                               sorted_accum_dual,
                                               window_ranges)

        rng = np.random.default_rng(6)
        Bi, Bj, R, wrows, W_in = 2000, 3000, 512, 128, 256
        args = []
        refs = []
        for n_s, seed in ((Bi, 1), (Bj, 2)):
            r = np.random.default_rng(seed)
            rows = np.sort(r.integers(0, R - 5, n_s)).astype(np.int32)
            m = (r.random(n_s) > 0.3).astype(np.float32)
            g = r.normal(size=(n_s, W_in)).astype(np.float32) * m[:, None]
            starts, counts = window_ranges(rows, R, wrows)
            rows2d = pad_samples(rows, R)
            rows_m = rows2d.reshape(-1).copy()
            rows_m[:n_s] = np.where(m > 0, rows, R)
            g_p = np.zeros((rows2d.size, W_in), np.float32)
            g_p[:n_s] = g
            args += [jnp.asarray(rows_m.reshape(rows2d.shape)),
                     jnp.asarray(g_p), jnp.asarray(starts),
                     jnp.asarray(counts)]
            refs.append((rows, g, m))
        out = np.asarray(sorted_accum_dual(
            *args, r_pad=R, neg_lanes=W_in, wrows=wrows, interpret=True,
            count_lanes=True))
        assert out.shape == (R, W_in + 128)
        (ri, gi, mi), (rj, gj, mj) = refs
        ref_pay = np.zeros((R, W_in), np.float32)
        np.add.at(ref_pay, rj, gj)
        np.add.at(ref_pay, ri, -gi)
        ref_cnt = np.zeros(R, np.float32)
        np.add.at(ref_cnt, ri, mi)
        np.add.at(ref_cnt, rj, mj)
        np.testing.assert_allclose(out[:, :W_in], ref_pay, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(out[:, W_in], ref_cnt)
