"""Hardware validation of every fused BPR kernel pipeline (VERDICT r3 #4).

Round 3's v5/v6/v7/v8 and wide kernels had only ever executed in Pallas
interpret mode on CPU; Mosaic lowering, VMEM budgets and DMA patterns were
unproven.  This script, run ON TPU, for each kernel version:

  1. runs the full packed epoch at small-but-real shapes chosen so
     ``engine_version`` genuinely selects that version (same shape table as
     ``tests/test_packed_accum.py::test_packed_epoch_matches_dense_reference``,
     scaled up to B=8192);
  2. compares final W / H / loss against the SAME call in interpret mode
     (the CPU-verified semantics) — catching wrong-answer lowering, not
     just compile failures;
  3. reports which version ``engine_version`` picks at the ML-20M headline
     bench shapes (B=131072, tile=1024, realistic stream).

Exit code 0 = every pipeline compiled and matched.  Output is one summary
line per pipeline plus a final JSON line.

Matches the schedule semantics of /root/reference/cymf/bpr.pyx:162-169
(already proven in interpret mode by the test suite); this script is purely
the hardware-lowering risk.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stream(U, I, B, S, seed, dense_users=None):
    rng = np.random.default_rng(seed)
    if dense_users:
        u2 = np.sort(rng.integers(0, dense_users, (S, B)).astype(np.int32),
                     axis=1)
    else:
        u2 = np.sort(rng.integers(0, U, (S, B)).astype(np.int32), axis=1)
    i2 = rng.integers(0, I, (S, B)).astype(np.int32)
    return u2, i2


def run_packed(version, U, I, K, B, S, wrows, interpret):
    import jax.numpy as jnp

    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.packed_epoch import (make_packed_optimizer,
                                           packed_bpr_epoch, prep_epoch,
                                           prep_static, unpack_device)

    os.environ["CYMF_TPU_PACKED_KERNEL"] = str(version)
    try:
        rng = np.random.default_rng(7)
        u2, i2 = _stream(U, I, B, S, seed=U + K)
        rw = pk.packed_rows(U, K, multiple=wrows)
        rh = pk.logical_rows(I, multiple=wrows)
        winw, wstart, si, rowsi, wini, bcs, bcn, kernel_v = prep_static(
            u2, i2, K, rw, rh, wrows, wrows)
        pos_keys = np.sort(u2.ravel().astype(np.int64) * I + i2.ravel())
        j2, mask, sj, rowsj, winj = prep_epoch(
            np.random.default_rng(9), u2, i2, pos_keys, U, I, K, rh, wrows)
        W0 = rng.normal(size=(U, K)).astype(np.float32) * 0.1
        H0 = rng.normal(size=(I, K)).astype(np.float32) * 0.1
        Wp = jnp.asarray(pk.pack_array(W0, K, multiple=wrows))
        Hp = jnp.asarray(pk.pack_logical(H0, K, multiple=wrows))
        opt = make_packed_optimizer("adam", 0.02)
        t0 = time.perf_counter()
        Wp2, Hp2, _, _, loss = packed_bpr_epoch(
            Wp, Hp, opt.init(Wp), opt.init(Hp),
            jnp.asarray(u2), jnp.asarray(i2), jnp.asarray(si),
            jnp.asarray(rowsi), jnp.asarray(wini), jnp.asarray(j2),
            jnp.asarray(mask), jnp.asarray(sj), jnp.asarray(rowsj),
            jnp.asarray(winj), jnp.asarray(winw), jnp.asarray(wstart),
            jnp.asarray(bcs), jnp.asarray(bcn), jnp.asarray(S * B),
            opt_name="adam", lr=0.02, weight_decay=0.01, K=K, rw=rw,
            rh=rh, wrows_w=wrows, wrows_h=wrows, interpret=interpret,
            kernel_v=kernel_v)
        W = np.asarray(unpack_device(Wp2, K))[:U]
        H = np.asarray(Hp2[:I, :K])
        dt = time.perf_counter() - t0
        return kernel_v, W, H, float(loss), dt
    finally:
        del os.environ["CYMF_TPU_PACKED_KERNEL"]


def run_pool(U, I, K, B, S, P, wrows, interpret):
    import jax.numpy as jnp

    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.packed_epoch import (make_packed_optimizer,
                                           packed_bpr_pool_epoch,
                                           prep_pool_epoch, prep_static_pool,
                                           unpack_device)

    rng = np.random.default_rng(7)
    u2, i2 = _stream(U, I, B, S, seed=U + K + 1)
    rw = pk.packed_rows(U, K, multiple=wrows)
    rh = pk.logical_rows(I, multiple=wrows)
    winw, si, rowsi, wini = prep_static_pool(u2, i2, K, rw, rh, wrows, wrows)
    pos_keys = np.sort(u2.ravel().astype(np.int64) * I + i2.ravel())
    pool2, rjs, mask, _ = prep_pool_epoch(
        np.random.default_rng(3), u2, pos_keys, U, I, P)
    W0 = rng.normal(size=(U, K)).astype(np.float32) * 0.1
    H0 = rng.normal(size=(I, K)).astype(np.float32) * 0.1
    Wp = jnp.asarray(pk.pack_array(W0, K, multiple=wrows))
    Hp = jnp.asarray(pk.pack_logical(H0, K, multiple=wrows))
    opt = make_packed_optimizer("adam", 0.02)
    t0 = time.perf_counter()
    Wp2, Hp2, _, _, loss = packed_bpr_pool_epoch(
        Wp, Hp, opt.init(Wp), opt.init(Hp),
        jnp.asarray(u2), jnp.asarray(i2), jnp.asarray(si),
        jnp.asarray(rowsi), jnp.asarray(wini), jnp.asarray(pool2),
        jnp.asarray(rjs), jnp.asarray(mask), jnp.asarray(winw),
        jnp.asarray(S * B), opt_name="adam", lr=0.02, weight_decay=0.01,
        K=K, rw=rw, rh=rh, wrows_w=wrows, wrows_h=wrows,
        interpret=interpret)
    W = np.asarray(unpack_device(Wp2, K))[:U]
    H = np.asarray(Hp2[:I, :K])
    return W, H, float(loss), time.perf_counter() - t0


def run_wide(U, I, K, B, S, wrows, interpret):
    import jax.numpy as jnp

    from cymf_tpu.ops.packed_epoch import make_packed_optimizer, prep_epoch
    from cymf_tpu.ops.wide_epoch import (pack_wide, prep_static_wide,
                                         wide_bpr_epoch, wide_rows,
                                         wide_sorted_masks)

    rng = np.random.default_rng(7)
    u2, i2 = _stream(U, I, B, S, seed=U + K + 2)
    rw, rh = wide_rows(U, wrows), wide_rows(I, wrows)
    rowsu, winw, si, rowsi, wini = prep_static_wide(u2, i2, rw, rh, wrows)
    pos_keys = np.sort(u2.ravel().astype(np.int64) * I + i2.ravel())
    j2, mask, sj, rowsj, winj = prep_epoch(
        np.random.default_rng(9), u2, i2, pos_keys, U, I, K, rh, wrows)
    mi2, mj2 = wide_sorted_masks(mask, si, sj)
    W0 = rng.normal(size=(U, K)).astype(np.float32) * 0.1
    H0 = rng.normal(size=(I, K)).astype(np.float32) * 0.1
    Wd = jnp.asarray(pack_wide(W0, K, multiple=wrows))
    Hd = jnp.asarray(pack_wide(H0, K, multiple=wrows))
    opt = make_packed_optimizer("adam", 0.02)
    t0 = time.perf_counter()
    W2, H2, _, _, loss = wide_bpr_epoch(
        Wd, Hd, opt.init(Wd), opt.init(Hd),
        jnp.asarray(u2), jnp.asarray(i2), jnp.asarray(rowsu),
        jnp.asarray(winw), jnp.asarray(si), jnp.asarray(rowsi),
        jnp.asarray(wini), jnp.asarray(j2), jnp.asarray(mask),
        jnp.asarray(sj), jnp.asarray(rowsj), jnp.asarray(winj),
        jnp.asarray(mi2), jnp.asarray(mj2),
        jnp.asarray(S * B), opt_name="adam", lr=0.02, weight_decay=0.01,
        K=K, rw=rw, rh=rh, wrows=wrows, interpret=interpret)
    W = np.asarray(W2[:U, :K])
    H = np.asarray(H2[:I, :K])
    return W, H, float(loss), time.perf_counter() - t0


def run_glove(V1, V2, K, B, S, wrows, interpret):
    import jax.numpy as jnp

    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.glove_epoch import (packed_glove_epoch,
                                          prep_glove_static)
    from cymf_tpu.ops.packed_epoch import PackedAdaGrad

    rng = np.random.default_rng(7)
    Kp = K + 2
    c2 = np.sort(rng.integers(0, V1, (S, B)).astype(np.int32), axis=1)
    x2 = rng.integers(0, V2, (S, B)).astype(np.int32)
    n2 = rng.integers(1, 40, (S, B)).astype(np.float64)
    rw = pk.packed_rows(V1, Kp, multiple=wrows)
    rh = pk.logical_rows(V2, multiple=wrows)
    m2, f2, l2, winw, sx, rowsx, winx = prep_glove_static(
        c2, x2, n2, V1, K, rw, rh, wrows, wrows, 10.0, 0.75)
    from cymf_tpu.ops.glove_epoch import augment_tables
    Zc_np, Zx_np = augment_tables(
        rng.normal(size=(V1, K)) * 0.1, rng.normal(size=(V1, 1)),
        rng.normal(size=(V2, K)) * 0.1, rng.normal(size=(V2, 1)))
    Zc_np = Zc_np.astype(np.float32)
    Zx_np = Zx_np.astype(np.float32)
    Zc = jnp.asarray(pk.pack_array(Zc_np, Kp, multiple=wrows))
    Zx = jnp.asarray(pk.pack_logical(Zx_np, Kp, multiple=wrows))
    opt = PackedAdaGrad(LR)
    t0 = time.perf_counter()
    Zc2, Zx2, _, _, loss = packed_glove_epoch(
        Zc, Zx, opt.init(Zc), opt.init(Zx),
        *(jnp.asarray(a) for a in
          (c2, x2, m2, f2, l2, sx, rowsx, winx, winw)),
        jnp.asarray(S * B, jnp.int32), lr=LR, K=K, rw=rw, rh=rh,
        wrows_w=wrows, wrows_h=wrows, interpret=interpret)
    loss = float(loss)
    W = pk.unpack_array(np.asarray(Zc2), V1, Kp)
    H = np.asarray(Zx2)[:V2, :Kp]
    return W, H, loss, time.perf_counter() - t0


def run_relmf(U, I, K, B, S, wrows, interpret):
    import jax.numpy as jnp

    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.packed_epoch import (make_packed_optimizer,
                                           unpack_device)
    from cymf_tpu.ops.relmf_epoch import (packed_relmf_epoch,
                                          prep_relmf_epoch)

    rng = np.random.default_rng(7)
    pos = rng.random((U, I)) < 0.02
    pu, pi = np.nonzero(pos)
    pos_keys = np.sort(pu.astype(np.int64) * I + pi)
    col_mean = pos.mean(axis=0)
    props = np.maximum(col_mean / max(col_mean.max(), 1e-12), 1e-5) ** 0.5
    rw = pk.packed_rows(U, K, multiple=wrows)
    rh = pk.logical_rows(I, multiple=wrows)
    u2, i2, lab, winw, si, rowsi, wini = prep_relmf_epoch(
        5, 0, S, B, U, I, K, rw, rh, wrows, wrows, pos_keys)
    invp = np.zeros((rh, 1), np.float32)
    invp[:I, 0] = 1.0 / np.maximum(props, 0.1)
    W0 = rng.normal(size=(U, K)).astype(np.float32) * 0.1
    H0 = rng.normal(size=(I, K)).astype(np.float32) * 0.1
    Wp = jnp.asarray(pk.pack_array(W0, K, multiple=wrows))
    Hp = jnp.asarray(pk.pack_logical(H0, K, multiple=wrows))
    opt = make_packed_optimizer("adam", LR)
    t0 = time.perf_counter()
    Wp2, Hp2, _, _, loss = packed_relmf_epoch(
        Wp, Hp, opt.init(Wp), opt.init(Hp),
        *(jnp.asarray(a) for a in (u2, i2, lab, si, rowsi, wini, winw,
                                   invp)),
        jnp.asarray(S * B), opt_name="adam", lr=LR, weight_decay=0.01,
        K=K, rw=rw, rh=rh, wrows_w=wrows, wrows_h=wrows,
        interpret=interpret)
    W = np.asarray(unpack_device(Wp2, K))[:U]
    H = np.asarray(Hp2[:I, :K])
    return W, H, float(loss), time.perf_counter() - t0


def run_relmf_device(U, I, K, B, S, wrows, interpret):
    """Round-5 on-device-prep RelMF pipeline (draws/labels/sorts/windows
    traced into the scan).  threefry is backend-deterministic, so the
    TPU and interpret runs see IDENTICAL streams."""
    import jax
    import jax.numpy as jnp

    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.hashset import build_pair_hashset
    from cymf_tpu.ops.packed_epoch import (make_packed_optimizer,
                                           unpack_device)
    from cymf_tpu.ops.relmf_epoch import packed_relmf_epoch_device

    rng = np.random.default_rng(7)
    pos = rng.random((U, I)) < 0.02
    pu, pi = np.nonzero(pos)
    hs = jax.tree_util.tree_map(jnp.asarray, build_pair_hashset(pu, pi))
    col_mean = pos.mean(axis=0)
    props = np.maximum(col_mean / max(col_mean.max(), 1e-12), 1e-5) ** 0.5
    rw = pk.packed_rows(U, K, multiple=wrows)
    rh = pk.logical_rows(I, multiple=wrows)
    W0 = rng.normal(size=(U, K)).astype(np.float32) * 0.1
    H0 = rng.normal(size=(I, K)).astype(np.float32) * 0.1
    Wp = jnp.asarray(pk.pack_array(W0, K, multiple=wrows))
    Hp = jnp.asarray(pk.pack_logical(H0, K, multiple=wrows))
    invp = np.zeros(rh, np.float32)
    invp[:I] = 1.0 / np.maximum(props, 0.1)
    Hp = Hp.at[:, K].set(jnp.asarray(invp))  # invp rides lane K
    opt = make_packed_optimizer("adam", LR)
    t0 = time.perf_counter()
    Wp2, Hp2, _, _, loss = packed_relmf_epoch_device(
        Wp, Hp, opt.init(Wp), opt.init(Hp), hs, jax.random.PRNGKey(3),
        jnp.asarray(0, jnp.int32), jnp.asarray(float(S * B), jnp.float32),
        S=S, B=B, num_users=U, num_items=I, opt_name="adam", lr=LR,
        weight_decay=0.01, K=K, rw=rw, rh=rh, wrows_w=wrows,
        wrows_h=wrows, interpret=interpret)
    W = np.asarray(unpack_device(Wp2, K))[:U]
    H = np.asarray(Hp2[:I, :K])
    return W, H, float(loss), time.perf_counter() - t0


LR = 0.02  # must match run_* lr — the Adam sign-flip drift scale


def _cmp(name, got, ref, results, rtol=3e-3, atol=3e-4):
    """MATCH = within f32 tolerance.  DRIFT = sparse differences bounded
    by the Adam first-touch update scale (update ~= -lr*sign(g); a tiny
    gradient whose SIGN differs between the bf16-split hardware matmul
    and the f32 interpret path flips the update by 2*lr) — expected
    precision behavior, not a lowering bug.  MISMATCH = anything worse.
    """
    gw, gh, gl = got
    rw_, rh_, rl = ref
    loss_ok = abs(gl - rl) <= 1e-2 * abs(rl) + 1e-4
    bad = 0
    maxd = 0.0
    for g, r in ((gw, rw_), (gh, rh_)):
        d = np.abs(g - r)
        viol = d > (atol + rtol * np.abs(r))
        bad += int(viol.sum())
        if viol.any():
            maxd = max(maxd, float(d[viol].max()))
    total = gw.size + gh.size
    if bad == 0 and loss_ok:
        results[name] = "MATCH"
        print(f"  {name}: MATCH (loss tpu={gl:.6f} interp={rl:.6f})",
              flush=True)
    elif loss_ok and bad / total < 0.02 and maxd <= 4.2 * LR:
        results[name] = (f"DRIFT ({bad}/{total} elems, max {maxd:.4f} "
                         f"<= 4*lr)")
        print(f"  {name}: {results[name]} (loss tpu={gl:.6f} "
              f"interp={rl:.6f})", flush=True)
    else:
        results[name] = (f"MISMATCH: {bad}/{total} elems, max {maxd:.4f}, "
                         f"loss tpu={gl:.6f} interp={rl:.6f}")
        print(f"  {name}: {results[name]}", flush=True)


def main():
    import jax

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    if not on_tpu:
        print("WARNING: not on TPU — comparing interpret vs interpret "
              "(lowering NOT validated)", flush=True)

    results = {}
    # shape table: (tag, version, U, I, K, B, S, wrows) — chosen so
    # engine_version's data gate actually selects `version` (dense user
    # ranges for v5/v6 span fits, sparse for v7)
    configs = [
        ("v5", 5, 300, 170, 20, 2048, 2, 128),
        ("v6", 6, 1200, 400, 20, 8192, 2, 512),
        ("v7", 7, 12000, 900, 20, 8192, 2, 512),
        ("v4", 4, 12000, 900, 20, 8192, 2, 512),
    ]
    for tag, want_v, U, I, K, B, S, wrows in configs:
        print(f"[{tag}] packed epoch U={U} I={I} K={K} B={B}", flush=True)
        try:
            v, W_t, H_t, l_t, dt = run_packed(want_v, U, I, K, B, S, wrows,
                                              interpret=not on_tpu)
            if v != want_v:
                results[tag] = f"GATE: engine_version chose v{v}"
                print(f"  {tag}: gate fell back to v{v} — skipping",
                      flush=True)
                continue
            print(f"  compiled+ran in {dt:.1f}s", flush=True)
            _, W_r, H_r, l_r, _ = run_packed(want_v, U, I, K, B, S, wrows,
                                             interpret=True)
            _cmp(tag, (W_t, H_t, l_t), (W_r, H_r, l_r), results)
        except Exception as e:
            results[tag] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
            print(f"  {tag}: FAIL {type(e).__name__}: {e}", flush=True)

    print("[v8] pool epoch", flush=True)
    try:
        W_t, H_t, l_t, dt = run_pool(12000, 900, 20, 8192, 2, 1024, 512,
                                     interpret=not on_tpu)
        print(f"  compiled+ran in {dt:.1f}s", flush=True)
        W_r, H_r, l_r, _ = run_pool(12000, 900, 20, 8192, 2, 1024, 512,
                                    interpret=True)
        _cmp("v8_pool", (W_t, H_t, l_t), (W_r, H_r, l_r), results)
    except Exception as e:
        results["v8_pool"] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
        print(f"  v8_pool: FAIL {type(e).__name__}: {e}", flush=True)

    print("[wide] d=256 epoch", flush=True)
    try:
        W_t, H_t, l_t, dt = run_wide(3000, 900, 256, 8192, 2, 512,
                                     interpret=not on_tpu)
        print(f"  compiled+ran in {dt:.1f}s", flush=True)
        W_r, H_r, l_r, _ = run_wide(3000, 900, 256, 8192, 2, 512,
                                    interpret=True)
        _cmp("wide_d256", (W_t, H_t, l_t), (W_r, H_r, l_r), results)
    except Exception as e:
        results["wide_d256"] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
        print(f"  wide_d256: FAIL {type(e).__name__}: {e}", flush=True)

    print("[glove] packed fused-bias epoch (K=50)", flush=True)
    try:
        W_t, H_t, l_t, dt = run_glove(12000, 9000, 50, 8192, 2, 256,
                                      interpret=not on_tpu)
        print(f"  compiled+ran in {dt:.1f}s", flush=True)
        W_r, H_r, l_r, _ = run_glove(12000, 9000, 50, 8192, 2, 256,
                                     interpret=True)
        _cmp("glove_packed", (W_t, H_t, l_t), (W_r, H_r, l_r), results)
    except Exception as e:
        results["glove_packed"] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
        print(f"  glove_packed: FAIL {type(e).__name__}: {e}", flush=True)

    print("[relmf] packed pointwise epoch (K=20)", flush=True)
    try:
        W_t, H_t, l_t, dt = run_relmf(12000, 900, 20, 8192, 2, 256,
                                      interpret=not on_tpu)
        print(f"  compiled+ran in {dt:.1f}s", flush=True)
        W_r, H_r, l_r, _ = run_relmf(12000, 900, 20, 8192, 2, 256,
                                     interpret=True)
        _cmp("relmf_packed", (W_t, H_t, l_t), (W_r, H_r, l_r), results)
    except Exception as e:
        results["relmf_packed"] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
        print(f"  relmf_packed: FAIL {type(e).__name__}: {e}", flush=True)

    print("[relmf-device] on-device-prep epoch (K=20)", flush=True)
    try:
        W_t, H_t, l_t, dt = run_relmf_device(12000, 900, 20, 8192, 2,
                                             256, interpret=not on_tpu)
        print(f"  compiled+ran in {dt:.1f}s", flush=True)
        W_r, H_r, l_r, _ = run_relmf_device(12000, 900, 20, 8192, 2,
                                            256, interpret=True)
        _cmp("relmf_device", (W_t, H_t, l_t), (W_r, H_r, l_r), results)
    except Exception as e:
        results["relmf_device"] = \
            f"FAIL: {type(e).__name__}: {str(e)[:300]}"
        print(f"  relmf_device: FAIL {type(e).__name__}: {e}", flush=True)

    print("[chol] pallas diagonal-block Cholesky+inverse (B=64)", flush=True)
    try:
        import time as _time

        import jax.numpy as jnp

        from cymf_tpu.ops.chol_kernel import chol_inv_batched
        rngc = np.random.default_rng(11)
        Xc = rngc.standard_normal((256, 64, 8)).astype(np.float32)
        Ac = np.einsum("cki,cli->ckl", Xc, Xc) / 8 \
            + np.eye(64, dtype=np.float32)
        t0 = _time.time()
        L_t, Li_t = chol_inv_batched(jnp.asarray(Ac), block=64,
                                     interpret=not on_tpu)
        L_t = np.array(L_t); Li_t = np.array(Li_t)
        print(f"  compiled+ran in {_time.time()-t0:.1f}s", flush=True)
        L_i, Li_i = chol_inv_batched(jnp.asarray(Ac), block=64,
                                     interpret=True)
        # STRICT compare — no Adam sign-flip drift bucket applies to a
        # Cholesky kernel: anything beyond f32 round-off is a lowering bug
        dmax = max(float(np.abs(L_t - np.array(L_i)).max()),
                   float(np.abs(Li_t - np.array(Li_i)).max()))
        if dmax < 1e-4:
            results["chol_kernel"] = "MATCH"
            print(f"  chol_kernel: MATCH (max |tpu-interp| {dmax:.1e})",
                  flush=True)
        else:
            results["chol_kernel"] = f"MISMATCH (max {dmax:.3e})"
            print(f"  chol_kernel: MISMATCH (max {dmax:.3e})", flush=True)
    except Exception as e:
        results["chol_kernel"] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
        print(f"  chol_kernel: FAIL {type(e).__name__}: {e}", flush=True)

    # which version does the headline bench run? (host-side prep only)
    try:
        from cymf_tpu.dataset.synthetic import bench_interactions
        from cymf_tpu.ops import packed as pk
        from cymf_tpu.ops.packed_epoch import engine_version

        U, I, K, B = 138493, 26744, 20, 131072
        nnz = 1_000_000 if os.environ.get("SMOKE_SMALL") == "1" \
            else 20_000_263
        users, items = bench_interactions(U, I, nnz, seed=0)
        S = max(1, len(users) // B)
        u2 = np.sort(users[:S * B].reshape(S, B), axis=1, kind="stable")
        rw = pk.packed_rows(U, K, multiple=512)
        v = engine_version(K, rw, 512, u2=u2)
        results["ml20m_engine_version"] = v
        print(f"[bench shapes] engine_version at ML-20M headline: v{v}",
              flush=True)
    except Exception as e:
        results["ml20m_engine_version"] = f"FAIL: {e}"

    ok = all(str(r).startswith(("MATCH", "DRIFT", "GATE"))
             or isinstance(r, int) for r in results.values())
    print(json.dumps({"smoke": results, "on_tpu": on_tpu, "ok": ok}),
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
