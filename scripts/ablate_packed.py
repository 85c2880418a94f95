"""Per-stage ablation of the packed fused BPR step (v5 pipeline).

Times cumulative stage prefixes of `cymf_tpu.ops.packed_epoch.packed_bpr_epoch`
at ML-20M shapes (B=131072, d=20) the same way docs/PERF.md's breakdown
table was produced: each stage is a jitted S-step `lax.scan` whose carry
forces the stage's outputs to stay live, timed with a true value-fetch
barrier (`jax.device_get` — `block_until_ready` does not synchronize
through the axon relay, CLAUDE.md).

Stages (cumulative, v6 pipeline — set CYMF_TPU_PACKED_V6=0 for v5):
  1 gathers      Hp[i] + decorated Hp[j] (the two remaining XLA gathers)
  2 sample       + the fused kernel (v6: sample phase AND W-side
                 accumulation in one kernel; v5: sample kernel only)
  3 reorder      + Q[si], Q[sj] sort-permutation gathers
  4 accum        + remaining sorted accumulation (v6: the H-side dual
                 kernel; v5: W single + H dual kernels)
  5 optimizer    + packed Adam passes == the full step

Usage:  timeout 1800 python scripts/ablate_packed.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.fused_sample import (bpr_sample_phase,
                                           bpr_sample_phase_v5, decorate)
    from cymf_tpu.ops.fused_step import (bpr_block_step_v6,
                                         bpr_range_step_v7)
    from cymf_tpu.ops.packed_epoch import (_fold_rows,
                                           make_packed_optimizer,
                                           packed_bpr_epoch, prep_epoch,
                                           prep_static)
    from cymf_tpu.ops.sorted_accum import sorted_accum, sorted_accum_dual

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    U = int(os.environ.get("ABL_USERS", "138493"))
    I = int(os.environ.get("ABL_ITEMS", "26744"))
    K = int(os.environ.get("ABL_DIM", "20"))
    B = int(os.environ.get("ABL_BATCH", "131072"))
    wrows_w = wrows_h = int(os.environ.get("ABL_WROWS", "256"))
    TILE = int(os.environ.get("CYMF_TPU_ACCUM_TILE", "1024"))
    interpret = jax.default_backend() != "tpu"

    # ABL_NNZ: total stream size to draw the S step batches from.  The
    # default S*B gives an UNREALISTICALLY flat degree profile (a 1.57M
    # draw has ~13x lower per-user degrees than the 20M headline stream
    # — docs/PERF.md); set ABL_NNZ=20000000 to slice the S batches out
    # of the full realistic stream (the generator shuffles globally, so
    # any S*B prefix is distribution-identical to the headline's steps).
    NNZ = max(int(os.environ.get("ABL_NNZ", "0")), S * B)
    users, items = bench_interactions(U, I, NNZ, seed=0)
    u2 = users[:S * B].reshape(S, B)
    i2 = items[:S * B].reshape(S, B)
    order = np.argsort(u2, axis=1, kind="stable")
    u2 = np.take_along_axis(u2, order, axis=1)
    i2 = np.take_along_axis(i2, order, axis=1)

    rw = pk.packed_rows(U, K, multiple=wrows_w)
    rh = pk.logical_rows(I, multiple=wrows_h)
    winw, wstart, si, rowsi, wini, bcs, bcn, kernel_v = prep_static(
        u2, i2, K, rw, rh, wrows_w, wrows_h)
    # rejection set spans the FULL drawn stream (as in bench.py), not
    # just the S sliced batches — collision rates stay headline-faithful
    pos_keys = np.sort(users.astype(np.int64) * I + items)
    j2, mask, sj, rowsj, winj = prep_epoch(
        np.random.default_rng(0), u2, i2, pos_keys, U, I, K, rh, wrows_h)

    rng = np.random.default_rng(0)
    Wp = jnp.asarray(pk.pack_array(
        rng.uniform(-0.1, 0.1, (U, K)) / K, K, multiple=wrows_w))
    Hp = jnp.asarray(pk.pack_logical(
        rng.uniform(-0.1, 0.1, (I, K)) / K, K, multiple=wrows_h))
    opt = make_packed_optimizer("adam", 0.001)
    ow, oh = opt.init(Wp), opt.init(Hp)
    s = pk.num_slots(K)

    # ABL_POOL=P: per-stage ablation of the pool engine (v8) instead
    P = int(os.environ.get("ABL_POOL", "0"))
    if P:
        from cymf_tpu.ops.fused_step import bpr_pool_step_v8
        from cymf_tpu.ops.packed_epoch import (packed_bpr_pool_epoch,
                                               prep_pool_epoch,
                                               prep_static_pool)
        winw_p, si_p, rowsi_p, wini_p = prep_static_pool(
            u2, i2, K, rw, rh, wrows_w, wrows_h)
        pool2, rjs, maskp, _ = prep_pool_epoch(
            np.random.default_rng(0), u2, pos_keys, U, I, P)
        xs = tuple(jnp.asarray(x) for x in
                   (u2, i2, si_p, rowsi_p, wini_p, pool2, rjs, maskp,
                    winw_p))
        payb = jnp.arange(pk.LANES) < K
        sv_neg = jnp.where(payb, jnp.float32(-1), jnp.float32(1))[None, :]

        def stage_scan(body):
            # streams as arguments — see the non-pool stage_scan note
            @jax.jit
            def run(xs_arg):
                def step(carry, x):
                    return carry + body(x), None
                out, _ = jax.lax.scan(step, jnp.float32(0), xs_arg)
                return out
            return lambda: run(xs)

        def p_gather(x):
            u, i, _, _, _, pool, rj, mf, ww = x
            mf = mf.astype(jnp.float32)
            Du = decorate(Wp.at[jnp.minimum(u // s, rw - 1)].get(
                indices_are_sorted=True, mode="promise_in_bounds"),
                u % s, mf, K)
            return jnp.sum(Du[0]) + jnp.sum(Hp[i][0]) + jnp.sum(Hp[pool][0])

        def p_sample_outs(x):
            u, i, _, _, _, pool, rj, mf, ww = x
            mf = mf.astype(jnp.float32)
            Du = decorate(Wp.at[jnp.minimum(u // s, rw - 1)].get(
                indices_are_sorted=True, mode="promise_in_bounds"),
                u % s, mf, K)
            return bpr_pool_step_v8(
                _fold_rows(u // s), rj, Du, Hp[i], Hp[pool], ww[0], ww[1],
                K=K, wd=0.01, rw=rw, wrows=wrows_w, interpret=interpret)

        def p_sample(x):
            Aw, Ap, Q = p_sample_outs(x)
            return jnp.sum(Aw[0]) + jnp.sum(Ap[0]) + jnp.sum(Q[0])

        def p_reorder(x):
            Aw, Ap, Q = p_sample_outs(x)
            return jnp.sum(Aw[0]) + jnp.sum(Ap[0]) + jnp.sum(Q[x[2]][0])

        def p_accum(x):
            u, i, sip, rowsi_t, wi, pool, rj, mf, ww = x
            Aw, Ap, Q = p_sample_outs(x)
            Ai = sorted_accum(rowsi_t, Q[sip], wi[0], wi[1], r_pad=rh,
                              wrows=wrows_h, tile=TILE, interpret=interpret,
                              precision="split")
            Aj = jnp.zeros((rh, pk.LANES), jnp.float32).at[pool].add(
                Ap, mode="drop")
            return jnp.sum(Aw[0]) + jnp.sum((Aj + Ai * sv_neg)[0])

        print(f"S={S} B={B} d={K} rw={rw} rh={rh} engine=v8 P={P} "
              f"backend={jax.default_backend()}", flush=True)
        for name, body in (("gathers", p_gather), ("sample", p_sample),
                           ("reorder", p_reorder), ("accum", p_accum)):
            run = stage_scan(body)
            out = run()
            float(jax.device_get(out))
            t0 = time.perf_counter()
            out = run()
            float(jax.device_get(out))
            dt = (time.perf_counter() - t0) / S
            print(f"{name:12s} {dt * 1e3:7.3f} ms/step", flush=True)

        state = [Wp, Hp, ow, oh]
        n_valid = jnp.asarray(S * B, jnp.int32)

        def full():
            state[0], state[1], state[2], state[3], loss = \
                packed_bpr_pool_epoch(
                    state[0], state[1], state[2], state[3], *xs, n_valid,
                    opt_name="adam", lr=0.001, weight_decay=0.01, K=K,
                    rw=rw, rh=rh, wrows_w=wrows_w, wrows_h=wrows_h,
                    interpret=interpret)
            return loss

        full()
        float(jax.device_get(state[0][0, 0]))
        t0 = time.perf_counter()
        full()
        float(jax.device_get(state[0][0, 0]))
        dt = (time.perf_counter() - t0) / S
        print(f"{'full step':12s} {dt * 1e3:7.3f} ms/step "
              f"= {B / dt / 1e6:.1f}M interactions/s", flush=True)
        return

    xs = tuple(jnp.asarray(x) for x in
               (u2, i2, si, rowsi, wini, j2, mask, sj, rowsj, winj, winw,
                wstart, bcs, bcn))

    def stage_scan(body):
        # index streams enter as ARGUMENTS: closed-over device arrays are
        # embedded in the remote-compile request and 413 the relay at
        # S>=96 (CLAUDE.md)
        @jax.jit
        def run(xs_arg):
            def step(carry, x):
                return carry + body(x), None
            out, _ = jax.lax.scan(step, jnp.float32(0), xs_arg)
            return out
        return lambda: run(xs)

    def g_gather(x):
        u, i, _, _, _, j, mf, *_ = x
        Dj = decorate(Hp[j], u % s, mf, K)
        return jnp.sum(Hp[i][0]) + jnp.sum(Dj[0])

    def sample_outs(x):
        """(Aw_or_None, SW_or_None, Q, loss_scalar) for the active
        pipeline."""
        u, i, _, _, _, j, mf, _, _, _, _, wst, cs_t, cn_t = x
        if kernel_v == 6:
            Dj = decorate(Hp[j], u % s, mf, K)
            Aw, Q = bpr_block_step_v6(
                Wp, _fold_rows(u // s), Hp[i], Dj, wst, cs_t, cn_t,
                K=K, wd=0.01, rw=rw, wrows=wrows_w, interpret=interpret)
            return Aw, None, Q, jnp.sum(Aw[0])
        if kernel_v == 5:
            Dj = decorate(Hp[j], u % s, mf, K)
            SW, Q, lossp = bpr_sample_phase_v5(
                Wp, wst, _fold_rows(u // s), Hp[i], Dj, K=K, wd=0.01,
                interpret=interpret)
            return None, SW, Q, lossp[0, 0]
        Du = decorate(Wp.at[jnp.minimum(u // s, rw - 1)].get(
            indices_are_sorted=True, mode="promise_in_bounds"),
            u % s, mf, K)
        if kernel_v == 7:
            ww = x[10]
            Aw, Q = bpr_range_step_v7(
                _fold_rows(u // s), Du, Hp[i], Hp[j], ww[0], ww[1],
                K=K, wd=0.01, rw=rw, wrows=wrows_w, interpret=interpret)
            return Aw, None, Q, jnp.sum(Aw[0])
        SW, Q, lossp = bpr_sample_phase(Du, Hp[i], Hp[j], K=K, wd=0.01,
                                        interpret=interpret)
        return None, SW, Q, lossp[0, 0]

    def g_sample(x):
        Aw, SW, Q, l0 = sample_outs(x)
        return jnp.sum(Q[0]) + l0 + (0. if SW is None else jnp.sum(SW[0]))

    def g_reorder(x):
        sip, sjp = x[2], x[7]
        Aw, SW, Q, l0 = sample_outs(x)
        return (jnp.sum(Q[sip][0]) + jnp.sum(Q[sjp][0]) + l0
                + (0. if SW is None else jnp.sum(SW[0])))

    def g_accum(x):
        u, i, sip, rowsi_t, wi, j, mf, sjp, rowsj_t, wj, ww, *_ = x
        Aw, SW, Q, l0 = sample_outs(x)
        if kernel_v not in (6, 7):
            Aw = sorted_accum(_fold_rows(u // s), SW, ww[0], ww[1],
                              r_pad=rw, wrows=wrows_w, tile=TILE,
                              interpret=interpret, precision="split")
        D = sorted_accum_dual(
            rowsi_t, Q[sip], wi[0], wi[1], rowsj_t, Q[sjp], wj[0], wj[1],
            r_pad=rh, neg_lanes=K, wrows=wrows_h, tile=TILE,
            interpret=interpret, precision="split")
        return jnp.sum(Aw[0]) + jnp.sum(D[0]) + l0

    def time_run(name, run):
        out = run()
        float(jax.device_get(out))
        t0 = time.perf_counter()
        out = run()
        float(jax.device_get(out))
        dt = (time.perf_counter() - t0) / S
        print(f"{name:12s} {dt * 1e3:7.3f} ms/step", flush=True)
        return dt

    print(f"S={S} B={B} d={K} rw={rw} rh={rh} engine=v{kernel_v} "
          f"backend={jax.default_backend()}", flush=True)
    time_run("gathers", stage_scan(g_gather))
    time_run("sample", stage_scan(g_sample))
    time_run("reorder", stage_scan(g_reorder))
    time_run("accum", stage_scan(g_accum))

    # full step (stage 5) via the real epoch function
    state = [Wp, Hp, ow, oh]
    n_valid = jnp.asarray(S * B, jnp.int32)

    def full():
        state[0], state[1], state[2], state[3], loss = packed_bpr_epoch(
            state[0], state[1], state[2], state[3], *xs, n_valid,
            opt_name="adam", lr=0.001, weight_decay=0.01, K=K, rw=rw,
            rh=rh, wrows_w=wrows_w, wrows_h=wrows_h, interpret=interpret,
            kernel_v=kernel_v)
        return loss

    full()
    float(jax.device_get(state[0][0, 0]))
    t0 = time.perf_counter()
    full()
    float(jax.device_get(state[0][0, 0]))
    dt = (time.perf_counter() - t0) / S
    print(f"{'full step':12s} {dt * 1e3:7.3f} ms/step "
          f"= {B / dt / 1e6:.1f}M interactions/s", flush=True)


if __name__ == "__main__":
    main()
