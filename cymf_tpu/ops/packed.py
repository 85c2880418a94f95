"""Packed embedding-table layout: several logical rows per 128-lane row.

Motivation (measured, docs/PERF.md): TPU arrays are physically padded to
128 lanes, so a d=20 embedding table wastes 6.4x row bandwidth — every
gather/scatter of a 20-float row moves a 512-byte granule.  Packing
``s = 128 // K`` logical rows into one physical row makes every granule
fully useful: the dense optimizer pass touches 6x fewer bytes and the
gradient accumulation buffer shrinks 6x, at the cost of a cheap lane
select on gather and a lane placement on scatter.

This replaces nothing in the reference (`/root/reference/cymf/model.pyx`
reads rows from row-major C arrays where a 20-float row is just 80
contiguous bytes) — it is pure TPU-layout engineering.

Layout: logical row ``r`` lives in physical row ``r // s``, lanes
``[(r % s) * K, (r % s) * K + K)``.  Lanes ``>= s * K`` are dead (zero).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

LANES = 128


def num_slots(K: int) -> int:
    """Logical rows per physical row.

    One lane per slot is reserved past the packed payload (the *count
    channel*, lanes ``[s*K, s*K + s)``): the fused BPR engine accumulates
    per-logical-row live-sample counts there in the same one-hot matmul
    that accumulates gradients (`packed_epoch.py`), so ``s`` satisfies
    ``s * (K + 1) <= 128``.  K > 127 is unsupported (no packing, no spare
    lane) — callers gate on :func:`packable`.
    """
    return max(1, LANES // (int(K) + 1))


def packable(K: int) -> bool:
    """True if the packed fused engine supports this dimension."""
    return int(K) <= LANES - 1


def count_base(K: int) -> int:
    """First lane of the count channel."""
    return num_slots(K) * int(K)


def packed_rows(n_rows: int, K: int, multiple: int = 8) -> int:
    """Physical row count for ``n_rows`` logical rows, padded up so the
    packed table tiles cleanly (sublane multiple, default 8 for f32)."""
    s = num_slots(K)
    r = -(-n_rows // s)
    return -(-r // multiple) * multiple


def logical_rows(n_rows: int, multiple: int = 8) -> int:
    """Row count of a LOGICAL-layout table (one row per 128-lane physical
    row, payload in lanes ``[0, K)``), padded to ``multiple``."""
    return -(-int(n_rows) // multiple) * multiple


def pack_logical(table, K: int | None = None, multiple: int = 8):
    """Host-side: (N, K) -> (R, 128) LOGICAL-layout ndarray: one logical
    row per physical row, payload in lanes ``[0, K)``, all other lanes
    zero.  Used for the H table of the fused BPR engine: aligned payloads
    need no slot rotations in the sample kernel, and the per-row count
    the accumulation produces lands in lane ``K`` (requires K < 128,
    which :func:`packable` already guarantees)."""
    table = np.asarray(table, np.float32)
    N, K_ = table.shape
    K = K_ if K is None else K
    R = logical_rows(N, multiple)
    out = np.zeros((R, LANES), np.float32)
    out[:N, :K] = table
    return out


def pack_array(table, K: int | None = None, multiple: int = 8):
    """Host-side: (N, K) -> (R, 128) packed ndarray (float32)."""
    table = np.asarray(table, np.float32)
    N, K_ = table.shape
    K = K_ if K is None else K
    s = num_slots(K)
    R = packed_rows(N, K, multiple)
    out = np.zeros((R, LANES), np.float32)
    flat = np.zeros((R * s, K), np.float32)
    flat[:N] = table
    out[:, : s * K] = flat.reshape(R, s * K)
    return out


def unpack_array(packed, N: int, K: int):
    """Host-side inverse of :func:`pack_array` -> (N, K) ndarray."""
    packed = np.asarray(packed)
    R = packed.shape[0]
    s = num_slots(K)
    flat = packed[:, : s * K].reshape(R * s, K)
    return np.array(flat[:N], np.float32)


def split_index(rows, K: int):
    """(physical_row, slot) of logical ``rows`` (device or host arrays)."""
    s = num_slots(K)
    if s == 1:
        return rows, rows * 0
    return rows // s, rows % s


def extract_rows(gathered, slot, K: int):
    """[B, 128] gathered physical rows + [B] slot -> [B, K] logical rows.

    A static unrolled select over the s slot positions (VPU-cheap, no
    dynamic lane gather, which XLA lowers poorly on TPU).
    """
    s = num_slots(K)
    if s == 1:
        return gathered[:, :K]
    out = gathered[:, 0:K]
    for o in range(1, s):
        out = jnp.where((slot == o)[:, None], gathered[:, o * K:(o + 1) * K],
                        out)
    return out


def place_rows(grads, slot, K: int):
    """[B, K] logical grads + [B] slot -> [B, 128] lane-placed grads.

    Inverse of :func:`extract_rows`: grads land in their slot's lanes,
    all other lanes zero — ready for physical-row accumulation.
    """
    s = num_slots(K)
    B = grads.shape[0]
    if s == 1:
        pad = LANES - K
        return jnp.pad(grads, ((0, 0), (0, pad)))
    out = jnp.zeros((B, LANES), grads.dtype)
    for o in range(s):
        placed = jnp.pad(grads, ((0, 0), (o * K, LANES - K - o * K)))
        out = jnp.where((slot == o)[:, None], placed, out)
    return out


def place_with_count(vals, counts, slot, K: int):
    """[B, K] values + [B] counts + [B] slot -> [B, 128] lane-placed rows.

    Values land in their slot's payload lanes (as :func:`place_rows`) and
    ``counts`` lands in the slot's count-channel lane (``count_base + o``).
    One buffer then carries both operands of the fused one-hot
    accumulation: gradients AND per-logical-row live-sample counts.
    """
    s = num_slots(K)
    cbase = count_base(K)
    placed = place_rows(vals, slot, K)[:, :cbase]
    cc = (slot[:, None] == jnp.arange(s, dtype=slot.dtype)[None, :])
    cc = cc.astype(vals.dtype) * counts[:, None]
    pad = LANES - cbase - s
    out = jnp.concatenate([placed, cc], axis=1)
    if pad:
        out = jnp.pad(out, ((0, 0), (0, pad)))
    return out


def split_counts(acc, K: int):
    """[R, 128] fused accumulation buffer -> (payload [R, cbase],
    counts [R, s]) views."""
    cbase = count_base(K)
    s = num_slots(K)
    return acc[:, :cbase], acc[:, cbase:cbase + s]


def expand_counts(cnt, K: int):
    """[R, s] per-logical-row counts -> [R, s*K] per-payload-lane."""
    return jnp.repeat(cnt, int(K), axis=1)


def slot_mask(touched_any, K: int):
    """[R, 128] bool per-lane mask from a packed buffer's nonzero pattern.

    ``touched_any`` is the packed gradient buffer [R, 128]; a *slot* (one
    logical row) counts as touched iff any of its K lanes is nonzero.  The
    returned mask is True on every lane of a touched slot and False on
    dead lanes — this keeps sparse-Adam semantics per LOGICAL row even
    though moments are stored packed (an untouched logical row sharing a
    physical row with a touched one must not decay).
    """
    R = touched_any.shape[0]
    s = num_slots(K)
    used = touched_any[:, : s * K].reshape(R, s, K)
    t = jnp.any(used != 0, axis=-1, keepdims=True)  # [R, s, 1]
    mask = jnp.broadcast_to(t, (R, s, K)).reshape(R, s * K)
    if s * K < LANES:
        mask = jnp.pad(mask, ((0, 0), (0, LANES - s * K)))
    return mask
