"""Packed-table BPR epoch — the single-chip fast path.

Combines the three round-2 performance levers (docs/PERF.md has the
measured breakdown that motivated each):

1. **Packed tables** (`ops/packed.py`): at d <= 64, ``s = 128 // d``
   logical rows share one 128-lane physical row, so the dense optimizer
   pass and the gradient buffer shrink ``s``-fold.
2. **Pallas sorted accumulation** (`ops/sorted_accum.py`): gradient
   scatter-adds — the dominant step cost under XLA — become windowed
   one-hot MXU matmuls over host-sorted row streams.
3. **Host-side negative sampling**: the reference draws negatives on the
   fly from a shared mt19937 (`/root/reference/cymf/bpr.pyx:165-167`);
   here each epoch's negative stream, rejection mask, and sort
   permutations are one vectorized numpy pass (as the VMEM Pallas engine
   already does), freeing the device step of RNG + hash-probe work.
   Batch composition is fixed across epochs exactly like the reference
   (one shuffle before training, `bpr.pyx:104`), so the item-side sort
   permutation is computed once per fit; only negatives re-sort per epoch.

Semantics are identical to the XLA batch engine (`models/bpr.py`): one
synchronous update per touched row per step with the summed gradient,
sparse-Adam touched-row moments (per LOGICAL row — `packed.slot_mask`),
collision masking == the reference's skip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import packed as pk
from .sorted_accum import sorted_accum, window_ranges

TILE = 1024


def _fold_rows(phys, tile=TILE):
    """int32[B] -> lane-major int32[B/128, 128] (B must be a multiple of
    the DMA tile — the batch is rounded up to one by the trainer, so no
    per-step padding copy is ever materialized)."""
    return phys.reshape(-1, 128)


def unpack_device(Tp, K: int):
    """(R, 128) packed device array -> (R*s, K) logical rows (device op)."""
    s = pk.num_slots(K)
    R = Tp.shape[0]
    return Tp[:, : s * K].reshape(R * s, K)


class PackedAdam:
    """Adam over packed tables with per-logical-row touched masking
    (constant bias correction — parity quirk, `optimizer.pyx:150-160`)."""

    def __init__(self, alpha, beta1=0.9, beta2=0.999, epsilon=1e-8):
        self.alpha, self.beta1, self.beta2, self.epsilon = \
            float(alpha), float(beta1), float(beta2), float(epsilon)

    def init(self, Tp):
        return {"m": jnp.zeros_like(Tp), "v": jnp.zeros_like(Tp)}

    def update(self, Tp, state, gbuf, K):
        mask = pk.slot_mask(gbuf, K)
        m = jnp.where(mask, self.beta1 * state["m"]
                      + (1.0 - self.beta1) * gbuf, state["m"])
        v = jnp.where(mask, self.beta2 * state["v"]
                      + (1.0 - self.beta2) * jnp.square(gbuf), state["v"])
        delta = jnp.where(
            mask, -self.alpha * (m / (1.0 - self.beta1))
            / (jnp.sqrt(v / (1.0 - self.beta2)) + self.epsilon), 0.0)
        return Tp + delta, {"m": m, "v": v}


class PackedAdaGrad:
    """AdaGrad, ones-init accumulators (`optimizer.pyx:69-82`).  Zero
    gradient is naturally a no-op — no mask needed."""

    def __init__(self, lr):
        self.lr = float(lr)

    def init(self, Tp):
        return {"accum": jnp.ones_like(Tp)}

    def update(self, Tp, state, gbuf, K):
        accum = state["accum"] + jnp.square(gbuf)
        return Tp - self.lr * gbuf * jax.lax.rsqrt(accum), {"accum": accum}


class PackedSgd:
    def __init__(self, lr):
        self.lr = float(lr)

    def init(self, Tp):
        return {}

    def update(self, Tp, state, gbuf, K):
        return Tp - self.lr * gbuf, state


def make_packed_optimizer(name, lr):
    if name == "adam":
        return PackedAdam(alpha=lr)
    if name == "adagrad":
        return PackedAdaGrad(lr)
    if name == "sgd":
        return PackedSgd(lr)
    raise Exception(f"{name} is invalid.")


@functools.partial(
    jax.jit, static_argnames=("opt_name", "lr", "weight_decay", "K", "rw",
                              "rh", "wrows_w", "wrows_h", "interpret",
                              "precision"))
def packed_bpr_epoch(Wp, Hp, ow, oh, u_steps, i_steps, j_steps, mask_steps,
                     permh_steps, sloth_steps, rowsh_steps, winw, winh,
                     n_valid, *, opt_name, lr, weight_decay, K, rw, rh,
                     wrows_w=128, wrows_h=128, interpret=False,
                     precision="highest"):
    """One epoch over S pre-sorted minibatches (scan).  All index streams,
    masks, permutations and window ranges are host-prepared device arrays:

      u_steps int32[S, B]        users, ascending within each step
      i_steps int32[S, B]        positives, aligned with u order
      j_steps int32[S, B]        negatives (host-drawn), aligned with u
      mask_steps f32[S, B]       1 = live sample (in-data, no collision)
      permh_steps int32[S, 2B]   permutation sorting concat(i, j) by
                                 physical row (H-side gradient order)
      sloth_steps int32[S, 2B]   slot of each permuted H contribution
      rowsh_steps int32[S, 2B/128, 128]  folded sorted physical rows
      winw/winh int32[S, 2, NW]  sorted_accum window (starts; counts)
    """
    opt = make_packed_optimizer(opt_name, lr)
    wd = jnp.float32(weight_decay)
    s = pk.num_slots(K)

    def step(carry, xs):
        Wp, Hp, ow, oh, loss_acc = carry
        u, i, j, mf, permh, sloth, rowsh, ww, wh = xs
        phys_u, slot_u = u // s, u % s

        wu = pk.extract_rows(Wp[phys_u], slot_u, K)
        hi = pk.extract_rows(Hp[i // s], i % s, K)
        hj = pk.extract_rows(Hp[j // s], j % s, K)

        x = jnp.sum(wu * (hi - hj), axis=1, keepdims=True)
        sig = jax.nn.sigmoid(-x)
        mcol = mf[:, None]
        g_wu = -(sig * (hi - hj) - wd * wu) * mcol
        g_hi = -(sig * wu - wd * hi) * mcol
        g_hj = -(-sig * wu - wd * hj) * mcol
        l2 = (jnp.sum(jnp.square(wu), axis=1)
              + jnp.sum(jnp.square(hi), axis=1)
              + jnp.sum(jnp.square(hj), axis=1))
        loss = (-jax.nn.log_sigmoid(x[:, 0]) + wd * l2) * mf

        # --- W: u already sorted
        gW = pk.place_rows(g_wu, slot_u, K)
        gbw = sorted_accum(_fold_rows(phys_u), gW, ww[0], ww[1],
                           r_pad=rw, wrows=wrows_w, tile=TILE,
                           interpret=interpret, precision=precision)
        Wp, ow = opt.update(Wp, ow, gbw, K)

        # --- H: one fused accumulate over both contributions, permuted
        # into sorted physical-row order (permutation + sorted rows + slots
        # are host-prepared; j changes per epoch so this is per-epoch prep)
        g_cat = jnp.concatenate([g_hi, g_hj])[permh]
        gH = pk.place_rows(g_cat, sloth, K)
        gbh = sorted_accum(rowsh, gH, wh[0], wh[1],
                           r_pad=rh, wrows=wrows_h, tile=TILE,
                           interpret=interpret, precision=precision)
        Hp, oh = opt.update(Hp, oh, gbh, K)
        return (Wp, Hp, ow, oh, loss_acc + jnp.sum(loss)), None

    init = (Wp, Hp, ow, oh, jnp.zeros((), jnp.float32))
    (Wp, Hp, ow, oh, loss), _ = jax.lax.scan(
        step, init,
        (u_steps, i_steps, j_steps, mask_steps, permh_steps, sloth_steps,
         rowsh_steps, winw, winh))
    return Wp, Hp, ow, oh, loss / jnp.maximum(n_valid, 1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------

def prep_static(u2: np.ndarray, K: int, rw: int, wrows_w: int,
                tile: int = TILE):
    """Once per fit: per-step W-side windows (u is pre-sorted)."""
    S, B = u2.shape
    s = pk.num_slots(K)
    winw = np.empty((S, 2, rw // wrows_w), np.int32)
    for t in range(S):
        pu = np.minimum(u2[t].astype(np.int64) // s, np.iinfo(np.int32).max)
        winw[t, 0], winw[t, 1] = window_ranges(pu, rw, wrows_w, tile)
    return winw


def prep_epoch(rng: np.random.Generator, u2: np.ndarray, i2: np.ndarray,
               pos_keys: np.ndarray, num_users: int, num_items: int, K: int,
               rh: int, wrows_h: int, tile: int = TILE, native_seed=None):
    """Once per epoch: negative draws, rejection+padding mask, and the
    H-side sort permutation over concat(i, j) contributions + slot/row
    streams + windows.  Mirrors `bpr.pyx:165-167`: one uniform draw per
    interaction, collisions with known positives masked out.

    When the C++ extension is built and ``native_seed`` is given, the whole
    pass runs in ``_native.bpr_prep_epoch`` (OpenMP over steps, counting
    sort) — the TPU-era analogue of the reference's native host layer.  The
    native and numpy paths draw from different (equally uniform) streams;
    each is deterministic in its seed.
    """
    S, B = u2.shape
    s = pk.num_slots(K)
    if native_seed is not None:
        from ..native import HAVE_NATIVE, _native
        if HAVE_NATIVE and hasattr(_native, "bpr_prep_epoch"):
            u2c = np.ascontiguousarray(u2, np.int32)
            i2c = np.ascontiguousarray(i2, np.int32)
            keys = np.ascontiguousarray(pos_keys, np.int64)
            jb, mb, pb, sb, rb, wb = _native.bpr_prep_epoch(
                u2c, i2c, keys, S, B, num_users, num_items, s, rh,
                wrows_h, tile, int(native_seed))
            folded = 2 * B // 128
            return (np.frombuffer(jb, np.int32).reshape(S, B),
                    np.frombuffer(mb, np.float32).reshape(S, B),
                    np.frombuffer(pb, np.int32).reshape(S, 2 * B),
                    np.frombuffer(sb, np.int32).reshape(S, 2 * B),
                    np.frombuffer(rb, np.int32).reshape(S, folded, 128),
                    np.frombuffer(wb, np.int32).reshape(
                        S, 2, rh // wrows_h))
    j2 = rng.integers(0, num_items, (S, B)).astype(np.int32)
    u64 = u2.astype(np.int64)
    in_data = u64 < num_users
    keys = u64 * num_items + j2
    idx = np.searchsorted(pos_keys, keys)
    idx = np.minimum(idx, max(len(pos_keys) - 1, 0))
    collide = (pos_keys[idx] == keys) if len(pos_keys) else \
        np.zeros_like(keys, bool)
    mask = (in_data & ~collide).astype(np.float32)

    folded = 2 * B // 128
    permh = np.empty((S, 2 * B), np.int32)
    sloth = np.empty((S, 2 * B), np.int32)
    rowsh = np.empty((S, folded, 128), np.int32)
    winh = np.empty((S, 2, rh // wrows_h), np.int32)
    for t in range(S):
        cat = np.concatenate([i2[t], j2[t]])
        ph = cat // s
        perm = np.argsort(ph, kind="stable").astype(np.int32)
        permh[t] = perm
        cat_sorted = cat[perm]
        sloth[t] = cat_sorted % s
        ph_sorted = ph[perm]
        winh[t, 0], winh[t, 1] = window_ranges(ph_sorted, rh, wrows_h, tile)
        pad = np.full(folded * 128 - 2 * B, np.iinfo(np.int32).max, np.int32)
        rowsh[t] = np.concatenate([ph_sorted, pad]).reshape(folded, 128)
    return j2, mask, permh, sloth, rowsh, winh
