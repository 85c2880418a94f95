"""Pallas TPU engine: VMEM-resident sequential SGD for small-catalog tables.

This is the Pallas "segment-gather -> pairwise-score -> scatter-update"
kernel of the north star, specialized to the regime where both embedding
tables (plus optimizer state) fit in VMEM (~16 MB/core): the whole epoch runs
as ONE kernel, tables never leave the chip, and every sample applies its
update **sequentially, per-sample** — replaying the reference's
single-threaded update schedule (`model.pyx:47-87` + `optimizer.pyx`)
exactly, stronger than the synchronous-minibatch XLA path's statistical
equivalence.

Mechanics:

* parameters and optimizer state are *fused per row*: a table row is
  ``[param(128 lanes) | moment1(128) | moment2(128)]`` so one dynamic
  sublane read + one write covers the whole Adam update of a row (6x fewer
  dynamic slices than separate state tables — the dominant per-sample cost);
* tables live in VMEM for the entire grid (full-array block specs +
  ``input_output_aliases``; the sequential TPU grid makes in-place mutation
  race-free);
* per-step index chunks (user, positive, host-pregenerated negative,
  rejection mask) stream through SMEM blocks so scalar indices are readable
  inside the per-sample ``fori_loop``;
* the loss accumulates in SMEM across the grid.

Applicability: ``fits_vmem`` gates on the packed physical footprint.
ml-100k (d<=128, Adam: ~4 MB) and similar catalogs qualify; ML-20M-scale
tables do not — the XLA batch path covers those.

Negatives are pregenerated on the host with rejection against the positive
set (vectorized ``searchsorted`` over (u*I+j) keys), exactly the reference's
skip semantics (`bpr.pyx:165-167`) expressed as a mask.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 10 * 1024 * 1024
LANES = 128
_N_STATE = {"sgd": 0, "adagrad": 1, "adam": 2}


def fits_vmem(num_rows_total: int, optimizer: str) -> bool:
    """Packed physical VMEM footprint of tables + fused optimizer state."""
    width = LANES * (1 + _N_STATE[optimizer])
    return num_rows_total * width * 4 <= VMEM_BUDGET_BYTES


def pack_table(T: np.ndarray, optimizer: str) -> jnp.ndarray:
    """[rows, K] params -> [rows, (1+n_state)*128] fused rows.

    Param lanes beyond K are zero; AdaGrad accumulator lanes start at ONE
    (`optimizer.pyx:69-70` — and ones in the unused lanes keep the rsqrt
    well-defined), Adam moments start at zero.
    """
    rows, K = T.shape
    if K > LANES:
        raise ValueError(f"pallas engine supports K <= {LANES}, got {K}")
    n_state = _N_STATE[optimizer]
    out = np.zeros((rows, LANES * (1 + n_state)), np.float32)
    out[:, :K] = T
    if optimizer == "adagrad":
        out[:, LANES:2 * LANES] = 1.0
    return jnp.asarray(out)


def unpack_table(P, K: int) -> jnp.ndarray:
    """Fused rows -> [rows, K] params."""
    return P[:, :K]


def generate_epoch_negatives(rng: np.random.Generator, users: np.ndarray,
                             num_items: int, pos_keys_sorted: np.ndarray
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """(negatives, keep_mask) for one epoch, host-side.

    One uniform draw per interaction; draws that hit a known positive are
    *masked out* (the reference skips them, `bpr.pyx:166-167`).
    ``pos_keys_sorted`` is the sorted array of ``u * num_items + i`` keys.
    """
    j = rng.integers(0, num_items, size=len(users)).astype(np.int32)
    keys = users.astype(np.int64) * num_items + j
    pos = np.searchsorted(pos_keys_sorted, keys)
    pos = np.minimum(pos, max(len(pos_keys_sorted) - 1, 0))
    if len(pos_keys_sorted):
        collide = pos_keys_sorted[pos] == keys
    else:
        collide = np.zeros(len(users), bool)
    return j, ~collide


def _make_kernel(optimizer: str, lr: float, wd: float, beta1: float,
                 beta2: float, eps: float, chunk: int, group: int):
    """``group`` samples are processed per loop iteration, vectorized on the
    VPU.  group=1 replays the reference's update schedule exactly;
    group=G>1 is the analogue of G Hogwild threads (`bpr.pyx:162`): samples
    within a group read the same table snapshot, and if two touch the same
    row the later write wins — the same benign lost-update race the
    reference accepts across its OpenMP threads."""
    n_state = _N_STATE[optimizer]

    def split_rows(rows):
        param = rows[:, :LANES]
        state = [rows[:, LANES * (s + 1):LANES * (s + 2)]
                 for s in range(n_state)]
        return param, state

    def updated_rows(param, state, g):
        """One optimizer step on fused rows [G, width]."""
        if optimizer == "adam":
            m, v = state
            m2 = beta1 * m + (1 - beta1) * g
            v2 = beta2 * v + (1 - beta2) * g * g
            p2 = param - lr * (m2 / (1 - beta1)) / (
                jnp.sqrt(v2 / (1 - beta2)) + eps)
            return jnp.concatenate([p2, m2, v2], axis=1)
        if optimizer == "adagrad":
            (a,) = state
            a2 = a + g * g
            p2 = param - lr * g * jax.lax.rsqrt(a2)
            return jnp.concatenate([p2, a2], axis=1)
        return param - lr * g

    def kernel(u_ref, i_ref, j_ref, m_ref, W_in, H_in, W, H, loss_ref):
        del W_in, H_in  # aliased with W, H

        @pl.when(pl.program_id(0) == 0)
        def _():
            loss_ref[0, 0] = 0.0

        def body(gi, acc):
            base = gi * group
            us = [u_ref[0, 0, base + t] for t in range(group)]
            is_ = [i_ref[0, 0, base + t] for t in range(group)]
            js = [j_ref[0, 0, base + t] for t in range(group)]
            keeps = [m_ref[0, 0, base + t] != 0 for t in range(group)]

            rows_u = jnp.concatenate(
                [W[pl.ds(us[t], 1), :] for t in range(group)], axis=0)
            rows_i = jnp.concatenate(
                [H[pl.ds(is_[t], 1), :] for t in range(group)], axis=0)
            rows_j = jnp.concatenate(
                [H[pl.ds(js[t], 1), :] for t in range(group)], axis=0)
            wu, st_u = split_rows(rows_u)
            hi, st_i = split_rows(rows_i)
            hj, st_j = split_rows(rows_j)
            diff = hi - hj
            x = jnp.sum(wu * diff, axis=1, keepdims=True)      # [G, 1]
            sig = 1.0 / (1.0 + jnp.exp(x))  # sigma(-x), model.pyx:78
            g_wu = -(sig * diff - wd * wu)
            g_hi = -(sig * wu - wd * hi)
            g_hj = -(-sig * wu - wd * hj)
            new_u = updated_rows(wu, st_u, g_wu)
            new_i = updated_rows(hi, st_i, g_hi)
            new_j = updated_rows(hj, st_j, g_hj)

            for t in range(group):
                # note: i != j whenever keep (j is not a positive of u)
                @pl.when(keeps[t])
                def _(t=t):
                    W[pl.ds(us[t], 1), :] = new_u[t:t + 1]
                    H[pl.ds(is_[t], 1), :] = new_i[t:t + 1]
                    H[pl.ds(js[t], 1), :] = new_j[t:t + 1]

            l2 = (jnp.sum(wu * wu, axis=1, keepdims=True)
                  + jnp.sum(hi * hi, axis=1, keepdims=True)
                  + jnp.sum(hj * hj, axis=1, keepdims=True))
            softplus = jnp.maximum(-x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))
            mf = jnp.concatenate(
                [jnp.where(keeps[t], 1.0, 0.0).reshape(1, 1)
                 for t in range(group)], axis=0)
            return acc + jnp.sum(mf * (softplus + wd * l2))

        loss_ref[0, 0] += jax.lax.fori_loop(0, chunk // group, body, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("optimizer", "lr", "wd", "beta1", "beta2", "eps",
                     "interpret", "group"))
def bpr_pallas_epoch(W_packed, H_packed, u, i, j, mask, *, optimizer: str,
                     lr: float, wd: float, beta1: float = 0.9,
                     beta2: float = 0.999, eps: float = 1e-8,
                     interpret: bool = False, group: int = 1):
    """Run one epoch of sequential BPR updates on fused tables.

    Args:
      W_packed/H_packed: fused [rows, (1+n_state)*128] tables (pack_table).
      u, i, j, mask: int32[S, 1, CHUNK] index streams (mask nonzero = keep).
      group: samples per vectorized inner iteration (must divide CHUNK);
        1 = exact sequential reference schedule, 8 = the 8-thread Hogwild
        analogue (same benign intra-group races).

    Returns (W_packed, H_packed, total_loss).
    """
    S, _, chunk = u.shape
    if chunk % group:
        raise ValueError(f"group {group} must divide chunk {chunk}")
    kernel = _make_kernel(optimizer, lr, wd, beta1, beta2, eps, chunk, group)
    smem_spec = pl.BlockSpec((1, 1, chunk), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM)
    Wo, Ho, loss = pl.pallas_call(
        kernel,
        grid=(S,),
        out_shape=[jax.ShapeDtypeStruct(W_packed.shape, W_packed.dtype),
                   jax.ShapeDtypeStruct(H_packed.shape, H_packed.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        in_specs=[smem_spec] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(u, i, j, mask, W_packed, H_packed)
    return Wo, Ho, loss[0, 0]


def _make_relmf_kernel(optimizer: str, lr: float, wd: float, beta1: float,
                       beta2: float, eps: float, chunk: int, group: int):
    """RelMF pointwise kernel (`model.pyx:99-142` semantics): per sample,

        s   = w_u . h_i
        gW  = -(w - s) * h_i + wd * w_u      (w = r / max(p, M), host-side)
        gH  = -(w - s) * w_u + wd * h_i
        L   = w (1-s)^2 + (1-w) s^2 + wd (|w_u|^2 + |h_i|^2)

    using the same fused-row tables / grouped sequential structure as the
    BPR kernel (group=1 exact schedule, group=G the G-thread Hogwild
    analogue)."""
    n_state = _N_STATE[optimizer]

    def split_rows(rows):
        param = rows[:, :LANES]
        state = [rows[:, LANES * (s + 1):LANES * (s + 2)]
                 for s in range(n_state)]
        return param, state

    def updated_rows(param, state, g):
        if optimizer == "adam":
            m, v = state
            m2 = beta1 * m + (1 - beta1) * g
            v2 = beta2 * v + (1 - beta2) * g * g
            p2 = param - lr * (m2 / (1 - beta1)) / (
                jnp.sqrt(v2 / (1 - beta2)) + eps)
            return jnp.concatenate([p2, m2, v2], axis=1)
        if optimizer == "adagrad":
            (a,) = state
            a2 = a + g * g
            p2 = param - lr * g * jax.lax.rsqrt(a2)
            return jnp.concatenate([p2, a2], axis=1)
        return param - lr * g

    def kernel(u_ref, i_ref, w_ref, m_ref, W_in, H_in, W, H, loss_ref):
        del W_in, H_in

        @pl.when(pl.program_id(0) == 0)
        def _():
            loss_ref[0, 0] = 0.0

        def body(gi, acc):
            base = gi * group
            us = [u_ref[0, 0, base + t] for t in range(group)]
            is_ = [i_ref[0, 0, base + t] for t in range(group)]
            keeps = [m_ref[0, 0, base + t] != 0 for t in range(group)]
            wvec = jnp.concatenate(
                [w_ref[0, 0, base + t].reshape(1, 1) for t in range(group)],
                axis=0)                                      # [G, 1]
            rows_u = jnp.concatenate(
                [W[pl.ds(us[t], 1), :] for t in range(group)], axis=0)
            rows_i = jnp.concatenate(
                [H[pl.ds(is_[t], 1), :] for t in range(group)], axis=0)
            wu, st_u = split_rows(rows_u)
            hi, st_i = split_rows(rows_i)
            s = jnp.sum(wu * hi, axis=1, keepdims=True)      # [G, 1]
            coef = wvec - s
            g_wu = -coef * hi + wd * wu
            g_hi = -coef * wu + wd * hi
            new_u = updated_rows(wu, st_u, g_wu)
            new_i = updated_rows(hi, st_i, g_hi)

            for t in range(group):
                @pl.when(keeps[t])
                def _(t=t):
                    W[pl.ds(us[t], 1), :] = new_u[t:t + 1]
                    H[pl.ds(is_[t], 1), :] = new_i[t:t + 1]

            l2 = (jnp.sum(wu * wu, axis=1, keepdims=True)
                  + jnp.sum(hi * hi, axis=1, keepdims=True))
            loss = (wvec * jnp.square(1.0 - s)
                    + (1.0 - wvec) * jnp.square(s) + wd * l2)
            mf = jnp.concatenate(
                [jnp.where(keeps[t], 1.0, 0.0).reshape(1, 1)
                 for t in range(group)], axis=0)
            return acc + jnp.sum(mf * loss)

        loss_ref[0, 0] += jax.lax.fori_loop(0, chunk // group, body, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("optimizer", "lr", "wd", "beta1", "beta2", "eps",
                     "interpret", "group"))
def relmf_pallas_epoch(W_packed, H_packed, u, i, w, mask, *, optimizer: str,
                       lr: float, wd: float, beta1: float = 0.9,
                       beta2: float = 0.999, eps: float = 1e-8,
                       interpret: bool = False, group: int = 1):
    """Sequential RelMF epoch on fused tables.

    Args:
      u, i: int32[S, 1, CHUNK] sampled cells; w: float32[S, 1, CHUNK]
      propensity-clipped label weights r / max(p, M) (host-precomputed);
      mask nonzero = keep (0 for padding).
    """
    S, _, chunk = u.shape
    if chunk % group:
        raise ValueError(f"group {group} must divide chunk {chunk}")
    kernel = _make_relmf_kernel(optimizer, lr, wd, beta1, beta2, eps, chunk,
                                group)
    smem_spec = pl.BlockSpec((1, 1, chunk), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM)
    Wo, Ho, loss = pl.pallas_call(
        kernel,
        grid=(S,),
        out_shape=[jax.ShapeDtypeStruct(W_packed.shape, W_packed.dtype),
                   jax.ShapeDtypeStruct(H_packed.shape, H_packed.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        in_specs=[smem_spec] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(u, i, w, mask, W_packed, H_packed)
    return Wo, Ho, loss[0, 0]


def _make_glove_kernel(lr: float, chunk: int, group: int, k_dim: int):
    """GloVe kernel over fused-bias augmented tables (AdaGrad only,
    `optimizer.pyx:85-123` semantics): per sample,

        diff = wc_aug . hx_aug - log(count)     (aug cols carry the biases)
        g_c  = f * diff * hx_aug  (const-1 column masked)
        g_x  = f * diff * wc_aug  (const-1 column masked)
        L    = 0.5 * f * diff^2

    where f = min((count/x_max)^alpha, 1) is host-precomputed."""

    def kernel(c_ref, x_ref, f_ref, lc_ref, m_ref, Wc_in, Wx_in, Wc, Wx,
               loss_ref):
        del Wc_in, Wx_in
        width = LANES
        col = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
        mask_c = (col != k_dim + 1).astype(jnp.float32)
        mask_x = (col != k_dim).astype(jnp.float32)

        @pl.when(pl.program_id(0) == 0)
        def _():
            loss_ref[0, 0] = 0.0

        def adagrad(param, acc, g):
            a2 = acc + g * g
            p2 = param - lr * g * jax.lax.rsqrt(a2)
            return jnp.concatenate([p2, a2], axis=1)

        def body(gi, acc):
            base = gi * group
            cs = [c_ref[0, 0, base + t] for t in range(group)]
            xs = [x_ref[0, 0, base + t] for t in range(group)]
            keeps = [m_ref[0, 0, base + t] != 0 for t in range(group)]
            fvec = jnp.concatenate(
                [f_ref[0, 0, base + t].reshape(1, 1) for t in range(group)],
                axis=0)
            lcvec = jnp.concatenate(
                [lc_ref[0, 0, base + t].reshape(1, 1)
                 for t in range(group)], axis=0)
            rows_c = jnp.concatenate(
                [Wc[pl.ds(cs[t], 1), :] for t in range(group)], axis=0)
            rows_x = jnp.concatenate(
                [Wx[pl.ds(xs[t], 1), :] for t in range(group)], axis=0)
            wc, ac = rows_c[:, :LANES], rows_c[:, LANES:]
            hx, ax = rows_x[:, :LANES], rows_x[:, LANES:]
            diff = jnp.sum(wc * hx, axis=1, keepdims=True) - lcvec
            fd = fvec * diff
            g_c = fd * hx * mask_c
            g_x = fd * wc * mask_x
            new_c = adagrad(wc, ac, g_c)
            new_x = adagrad(hx, ax, g_x)

            for t in range(group):
                @pl.when(keeps[t])
                def _(t=t):
                    Wc[pl.ds(cs[t], 1), :] = new_c[t:t + 1]
                    Wx[pl.ds(xs[t], 1), :] = new_x[t:t + 1]

            mf = jnp.concatenate(
                [jnp.where(keeps[t], 1.0, 0.0).reshape(1, 1)
                 for t in range(group)], axis=0)
            return acc + jnp.sum(mf * 0.5 * fvec * jnp.square(diff))

        loss_ref[0, 0] += jax.lax.fori_loop(0, chunk // group, body, 0.0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("lr", "k_dim", "interpret", "group"))
def glove_pallas_epoch(Wc_packed, Wx_packed, c, x, f, logcnt, mask, *,
                       lr: float, k_dim: int, interpret: bool = False,
                       group: int = 1):
    """Sequential GloVe epoch on fused-bias augmented AdaGrad tables.

    Tables are ``pack_table(augmented_params, "adagrad")`` where the
    augmented params are ``[w | b_central | 1]`` / ``[h | 1 | b_context]``
    (width k_dim + 2 <= 128).  ``f``/``logcnt`` are the host-precomputed
    sample weights and log-counts; mask nonzero = keep.
    """
    S, _, chunk = c.shape
    if chunk % group:
        raise ValueError(f"group {group} must divide chunk {chunk}")
    kernel = _make_glove_kernel(lr, chunk, group, k_dim)
    smem_spec = pl.BlockSpec((1, 1, chunk), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM)
    Wo, Xo, loss = pl.pallas_call(
        kernel,
        grid=(S,),
        out_shape=[jax.ShapeDtypeStruct(Wc_packed.shape, Wc_packed.dtype),
                   jax.ShapeDtypeStruct(Wx_packed.shape, Wx_packed.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        in_specs=[smem_spec] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(c, x, f, logcnt, mask, Wc_packed, Wx_packed)
    return Wo, Xo, loss[0, 0]
