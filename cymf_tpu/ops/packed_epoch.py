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

TILE = 2048


def _fold_rows(phys, tile=TILE):
    """int32[B] -> lane-major int32[(B+tile)/128, 128] with sentinel pad."""
    B = phys.shape[0]
    pad = jnp.full((tile,), jnp.iinfo(jnp.int32).max, jnp.int32)
    return jnp.concatenate([phys, pad]).reshape(-1, 128)


def _pad_g(g, tile=TILE):
    return jnp.concatenate([g, jnp.zeros((tile, 128), g.dtype)])


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
                              "rh", "wrows_w", "wrows_h", "interpret"))
def packed_bpr_epoch(Wp, Hp, ow, oh, u_steps, i_steps, j_steps, mask_steps,
                     permi_steps, permj_steps, winw, wini, winj, n_valid, *,
                     opt_name, lr, weight_decay, K, rw, rh,
                     wrows_w=256, wrows_h=256, interpret=False):
    """One epoch over S pre-sorted minibatches (scan).  All index streams,
    masks, permutations and window ranges are host-prepared device arrays:

      u_steps int32[S, B]       users, ascending within each step
      i_steps int32[S, B]       positives, aligned with u order
      j_steps int32[S, B]       negatives (host-drawn), aligned with u
      mask_steps f32[S, B]      1 = live sample (in-data, no collision)
      permi/permj int32[S, B]   permutations sorting i (resp. j) physical
      winw/wini/winj int32[S, 2, NW]  sorted_accum window (starts; counts)
    """
    opt = make_packed_optimizer(opt_name, lr)
    wd = jnp.float32(weight_decay)
    s = pk.num_slots(K)

    def step(carry, xs):
        Wp, Hp, ow, oh, loss_acc = carry
        u, i, j, mf, permi, permj, ww, wi, wj = xs
        phys_u, slot_u = u // s, u % s
        phys_i, slot_i = i // s, i % s
        phys_j, slot_j = j // s, j % s

        wu = pk.extract_rows(Wp[phys_u], slot_u, K)
        hi = pk.extract_rows(Hp[phys_i], slot_i, K)
        hj = pk.extract_rows(Hp[phys_j], slot_j, K)

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
        gbw = sorted_accum(_fold_rows(phys_u), _pad_g(gW), ww[0], ww[1],
                           r_pad=rw, wrows=wrows_w, tile=TILE,
                           interpret=interpret)
        Wp, ow = opt.update(Wp, ow, gbw, K)

        # --- H: permute each contribution into its sorted order
        i_s = i[permi]
        gHi = pk.place_rows(g_hi[permi], i_s % s, K)
        gbi = sorted_accum(_fold_rows(i_s // s), _pad_g(gHi),
                           wi[0], wi[1], r_pad=rh, wrows=wrows_h,
                           tile=TILE, interpret=interpret)
        j_s = j[permj]
        gHj = pk.place_rows(g_hj[permj], j_s % s, K)
        gbj = sorted_accum(_fold_rows(j_s // s), _pad_g(gHj),
                           wj[0], wj[1], r_pad=rh, wrows=wrows_h,
                           tile=TILE, interpret=interpret)
        Hp, oh = opt.update(Hp, oh, gbi + gbj, K)
        return (Wp, Hp, ow, oh, loss_acc + jnp.sum(loss)), None

    init = (Wp, Hp, ow, oh, jnp.zeros((), jnp.float32))
    (Wp, Hp, ow, oh, loss), _ = jax.lax.scan(
        step, init,
        (u_steps, i_steps, j_steps, mask_steps, permi_steps, permj_steps,
         winw, wini, winj))
    return Wp, Hp, ow, oh, loss / jnp.maximum(n_valid, 1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------

def prep_static(u2: np.ndarray, i2: np.ndarray, K: int, rw: int, rh: int,
                wrows_w: int, wrows_h: int, tile: int = TILE):
    """Once per fit: per-step W windows (u is pre-sorted) and the item-side
    sort permutation + windows (batch composition is epoch-invariant)."""
    S, B = u2.shape
    s = pk.num_slots(K)
    winw = np.empty((S, 2, rw // wrows_w), np.int32)
    wini = np.empty((S, 2, rh // wrows_h), np.int32)
    permi = np.empty((S, B), np.int32)
    for t in range(S):
        pu = np.minimum(u2[t].astype(np.int64) // s, np.iinfo(np.int32).max)
        winw[t, 0], winw[t, 1] = window_ranges(pu, rw, wrows_w, tile)
        pi = i2[t] // s
        perm = np.argsort(pi, kind="stable").astype(np.int32)
        permi[t] = perm
        wini[t, 0], wini[t, 1] = window_ranges(pi[perm], rh, wrows_h, tile)
    return winw, wini, permi


def prep_epoch(rng: np.random.Generator, u2: np.ndarray, pos_keys: np.ndarray,
               num_users: int, num_items: int, K: int, rh: int,
               wrows_h: int, tile: int = TILE):
    """Once per epoch: negative draws, rejection+padding mask, j-side sort
    permutation and windows.  Mirrors `bpr.pyx:165-167`: one uniform draw
    per interaction, collisions with known positives masked out."""
    S, B = u2.shape
    s = pk.num_slots(K)
    j2 = rng.integers(0, num_items, (S, B)).astype(np.int32)
    u64 = u2.astype(np.int64)
    in_data = u64 < num_users
    keys = u64 * num_items + j2
    idx = np.searchsorted(pos_keys, keys)
    idx = np.minimum(idx, max(len(pos_keys) - 1, 0))
    collide = (pos_keys[idx] == keys) if len(pos_keys) else \
        np.zeros_like(keys, bool)
    mask = (in_data & ~collide).astype(np.float32)
    permj = np.empty((S, B), np.int32)
    winj = np.empty((S, 2, rh // wrows_h), np.int32)
    for t in range(S):
        pj = j2[t] // s
        perm = np.argsort(pj, kind="stable").astype(np.int32)
        permj[t] = perm
        winj[t, 0], winj[t, 1] = window_ranges(pj[perm], rh, wrows_h, tile)
    return j2, mask, permj, winj
