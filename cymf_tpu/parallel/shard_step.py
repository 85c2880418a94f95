"""Explicit shard_map BPR training step — provable compute partitioning.

Round-1 review finding: with implicit (pjit-inferred) sharding, XLA chose an
"all-gather the batch's rows everywhere" pattern and it was impossible to
assert that the per-sample gradient work was actually *partitioned* across
the mesh rather than replicated.  This module makes the partitioning
explicit with ``shard_map`` + hand-placed collectives, so it is guaranteed
by construction and testable from the HLO:

* tables (and optimizer state) are **row-sharded**: device ``p`` owns rows
  ``[p * rpd, (p+1) * rpd)`` — model parallelism over the catalog, the TPU
  replacement for the reference's single shared-memory table
  (`/root/reference/cymf/bpr.pyx:97-101`);
* the interaction batch is **sharded over samples** — data parallelism, the
  replacement for OpenMP ``prange`` over samples (`bpr.pyx:162`);
* row exchange is explicit: ``all_gather`` the batch's *indices* (tiny),
  each owner resolves its rows, ``psum_scatter`` returns each device
  exactly its local samples' rows — comm is O(batch), never O(table);
* gradient return is the reverse: ``all_gather`` local grads, each owner
  scatter-adds the rows it owns into its shard, then runs the dense
  masked optimizer pass on its shard only.

Per-device cost: O(B) index work + O(B/n · K) gradient VPU work +
O(rows_shard · K) optimizer pass — every table- and sample-proportional
stage shrinks with the mesh.  ``tests/test_sharding_hlo.py`` compiles this
and fails if a table-sized collective ever appears.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.hashset import hashset_contains
from ..ops.segment import csr_lookup
from .mesh import ROW_AXIS


def _resolve_rows(table_shard, idx_all, rpd):
    """Rows ``idx_all`` (global ids, full batch) resolved from a row-sharded
    table: each device contributes the rows it owns, ``psum_scatter`` hands
    every device the resolved rows for its own batch shard."""
    p = jax.lax.axis_index(ROW_AXIS)
    lidx = idx_all - p * rpd
    owned = (lidx >= 0) & (lidx < rpd)
    contrib = jnp.where(owned[:, None],
                        table_shard[jnp.clip(lidx, 0, rpd - 1)], 0.0)
    return jax.lax.psum_scatter(contrib, ROW_AXIS, scatter_dimension=0,
                                tiled=True)


def _owned_rows(idx_all, rpd):
    """Local row index for owned global ids, drop-sentinel (rpd) otherwise."""
    p = jax.lax.axis_index(ROW_AXIS)
    lidx = idx_all - p * rpd
    owned = (lidx >= 0) & (lidx < rpd)
    return jnp.where(owned, lidx, rpd)


def sharded_bpr_epoch(mesh_ctx, optimizer, weight_decay, num_users,
                      num_items):
    """Build the jitted shard_map epoch function.

    Returns ``fn(W, H, opt_w, opt_h, u_steps, i_steps, hs, n_valid, key)``
    with the same signature/semantics as ``models.bpr._bpr_epoch`` (dense
    update mode), but with explicit per-device partitioning.
    """
    mesh = mesh_ctx.mesh
    n = mesh_ctx.num_devices
    wd = float(weight_decay)

    def epoch(W, H, opt_w, opt_h, u_steps, i_steps, hs, n_valid, key):
        Upad, K = W.shape
        Ipad = H.shape[0]
        rpd_u = Upad // n
        rpd_i = Ipad // n
        S, B = u_steps.shape
        Bn = B // n

        def device_epoch(W_s, H_s, ow_s, oh_s, u_st, i_st, hs_rep, key):
            p = jax.lax.axis_index(ROW_AXIS)

            def step(carry, xs):
                W_s, H_s, ow_s, oh_s, loss_acc = carry
                u_loc, i_loc, sidx = xs
                skey = jax.random.fold_in(key, sidx)
                # full-batch draw then slice: bitwise-identical negative
                # stream to the single-device path (parity tests rely on it)
                j_full = jax.random.randint(skey, (B,), 0, num_items,
                                            dtype=u_loc.dtype)
                j_loc = jax.lax.dynamic_slice(j_full, (p * Bn,), (Bn,))

                in_data = u_loc < num_users
                collide = hashset_contains(hs_rep, u_loc, j_loc)
                mf = (in_data & ~collide).astype(W_s.dtype)[:, None]

                u_all = jax.lax.all_gather(u_loc, ROW_AXIS, tiled=True)
                i_all = jax.lax.all_gather(i_loc, ROW_AXIS, tiled=True)
                j_all = jax.lax.all_gather(j_loc, ROW_AXIS, tiled=True)
                wu = _resolve_rows(W_s, u_all, rpd_u)
                hi = _resolve_rows(H_s, i_all, rpd_i)
                hj = _resolve_rows(H_s, j_all, rpd_i)

                # gradient work on the LOCAL batch shard only (B/n samples)
                x = jnp.sum(wu * (hi - hj), axis=1, keepdims=True)
                sig = jax.nn.sigmoid(-x)
                g_wu = -(sig * (hi - hj) - wd * wu) * mf
                g_hi = -(sig * wu - wd * hi) * mf
                g_hj = -(-sig * wu - wd * hj) * mf
                l2 = (jnp.sum(jnp.square(wu), axis=1)
                      + jnp.sum(jnp.square(hi), axis=1)
                      + jnp.sum(jnp.square(hj), axis=1))
                loss = (-jax.nn.log_sigmoid(x[:, 0]) + wd * l2) * mf[:, 0]

                # return path: owners accumulate the rows they own
                gw_all = jax.lax.all_gather(g_wu, ROW_AXIS, tiled=True)
                gi_all = jax.lax.all_gather(g_hi, ROW_AXIS, tiled=True)
                gj_all = jax.lax.all_gather(g_hj, ROW_AXIS, tiled=True)
                W_s, ow_s = optimizer.update_dense(
                    W_s, ow_s, [(_owned_rows(u_all, rpd_u), gw_all)])
                H_s, oh_s = optimizer.update_dense(
                    H_s, oh_s, [(_owned_rows(i_all, rpd_i), gi_all),
                                (_owned_rows(j_all, rpd_i), gj_all)])
                loss_sum = jax.lax.psum(jnp.sum(loss), ROW_AXIS)
                return (W_s, H_s, ow_s, oh_s, loss_acc + loss_sum), None

            init = (W_s, H_s, ow_s, oh_s, jnp.zeros((), W_s.dtype))
            (W_s, H_s, ow_s, oh_s, loss), _ = jax.lax.scan(
                step, init, (u_st.T, i_st.T, jnp.arange(S)))
            return W_s, H_s, ow_s, oh_s, loss

        table = P(ROW_AXIS, None)
        batch = P(ROW_AXIS, None)  # (B, S) layout: samples sharded
        rep = P()
        fn = jax.shard_map(
            device_epoch, mesh=mesh,
            in_specs=(table, table, table, table, batch, batch, rep, rep),
            out_specs=(table, table, table, table, rep),
            check_vma=False)
        W, H, opt_w, opt_h, loss = fn(W, H, opt_w, opt_h,
                                      u_steps.T, i_steps.T, hs, key)
        return W, H, opt_w, opt_h, loss / jnp.maximum(
            n_valid, 1).astype(W.dtype)

    return jax.jit(epoch, donate_argnums=(0, 1, 2, 3))


def sharded_relmf_epoch(mesh_ctx, optimizer, weight_decay, clip_value,
                        num_users, num_items, num_steps, batch_size,
                        binary):
    """Explicit shard_map RelMF epoch chunk — the multi-device analogue of
    ``models.relmf._relmf_epoch`` (same chunked/step0 contract, same
    bitwise negative stream: full-batch draws then per-device slices).

    The reference's RelMF Hogwild loop (`/root/reference/cymf/relmf.pyx:143`)
    shares one table in RAM; here tables + optimizer state are row-sharded,
    the B sampled cells are sharded over devices, row exchange is the same
    O(batch) all_gather/psum_scatter pattern proven for BPR, and the dense
    masked optimizer pass runs per shard.  Returns
    ``fn(W, H, opt_w, opt_h, label_src, props, key, step0)``.
    """
    mesh = mesh_ctx.mesh
    n = mesh_ctx.num_devices
    wd = float(weight_decay)
    M = float(clip_value)
    B = batch_size

    def epoch(W, H, opt_w, opt_h, label_src, props, key, step0):
        Upad, _ = W.shape
        Ipad = H.shape[0]
        rpd_u = Upad // n
        rpd_i = Ipad // n
        Bn = B // n

        def device_epoch(W_s, H_s, ow_s, oh_s, label_src, props, key,
                         step0):
            p = jax.lax.axis_index(ROW_AXIS)

            def step(carry, sidx):
                W_s, H_s, ow_s, oh_s, loss_acc = carry
                skey = jax.random.fold_in(key, sidx)
                ku, ki = jax.random.split(skey)
                # full-batch draw then slice: the cell stream is
                # bitwise-identical to the single-device path
                u_f = jax.random.randint(ku, (B,), 0, num_users,
                                         dtype=jnp.int32)
                i_f = jax.random.randint(ki, (B,), 0, num_items,
                                         dtype=jnp.int32)
                u_loc = jax.lax.dynamic_slice(u_f, (p * Bn,), (Bn,))
                i_loc = jax.lax.dynamic_slice(i_f, (p * Bn,), (Bn,))
                if binary:
                    r = hashset_contains(label_src, u_loc,
                                         i_loc).astype(W_s.dtype)
                else:
                    indptr, indices, data = label_src
                    _, r = csr_lookup(indptr, indices, data, u_loc, i_loc)
                pr = props[i_loc, 0]
                w = r / jnp.maximum(pr, M)

                u_all = jax.lax.all_gather(u_loc, ROW_AXIS, tiled=True)
                i_all = jax.lax.all_gather(i_loc, ROW_AXIS, tiled=True)
                wu = _resolve_rows(W_s, u_all, rpd_u)
                hi = _resolve_rows(H_s, i_all, rpd_i)

                s = jnp.sum(wu * hi, axis=1, keepdims=True)
                wcol = w[:, None]
                g_w = -(wcol * (1.0 - s) * hi
                        + (1.0 - wcol) * (0.0 - s) * hi) + wd * wu
                g_h = -(wcol * (1.0 - s) * wu
                        + (1.0 - wcol) * (0.0 - s) * wu) + wd * hi
                l2 = (jnp.sum(jnp.square(wu), axis=1)
                      + jnp.sum(jnp.square(hi), axis=1))
                loss = (w * jnp.square(1.0 - s[:, 0])
                        + (1.0 - w) * jnp.square(s[:, 0]) + wd * l2)

                gw_all = jax.lax.all_gather(g_w, ROW_AXIS, tiled=True)
                gh_all = jax.lax.all_gather(g_h, ROW_AXIS, tiled=True)
                W_s, ow_s = optimizer.update_dense(
                    W_s, ow_s, [(_owned_rows(u_all, rpd_u), gw_all)])
                H_s, oh_s = optimizer.update_dense(
                    H_s, oh_s, [(_owned_rows(i_all, rpd_i), gh_all)])
                loss_sum = jax.lax.psum(jnp.sum(loss), ROW_AXIS)
                return (W_s, H_s, ow_s, oh_s, loss_acc + loss_sum), None

            init = (W_s, H_s, ow_s, oh_s, jnp.zeros((), W_s.dtype))
            (W_s, H_s, ow_s, oh_s, loss), _ = jax.lax.scan(
                step, init, step0 + jnp.arange(num_steps))
            return W_s, H_s, ow_s, oh_s, loss

        table = P(ROW_AXIS, None)
        rep = P()
        fn = jax.shard_map(
            device_epoch, mesh=mesh,
            in_specs=(table, table, table, table, rep, rep, rep, rep),
            out_specs=(table, table, table, table, rep),
            check_vma=False)
        return fn(W, H, opt_w, opt_h, label_src, props, key, step0)

    return jax.jit(epoch, donate_argnums=(0, 1, 2, 3))


def sharded_wmf_chunk(mesh_ctx, weight: float, weight_decay: float,
                      num_components: int, solver: str,
                      wb_max_p: int = 0):
    """Explicit shard_map WMF chunk solve — the multi-device analogue of
    ``ops.als.wmf_chunk_solve`` + the target-row scatter.

    The reference's ALS ``prange`` (`/root/reference/cymf/wmf.pyx:150-174`)
    solves rows on threads over shared RAM; here the source table ``Y`` and
    target table ``T`` are row-sharded, the chunk's C rows are sharded over
    devices (each solves C/n K x K systems), the Gramian is a local matmul
    + psum, and the row exchange is the O(gathered-rows)
    all_gather/psum_scatter pattern.  Solutions all_gather (C x K, small)
    so each device scatters the target rows it owns.

    ``wb_max_p`` (round 5): chunks whose degree pad ``P`` is <= this
    solve via the Woodbury identity (`ops.als.wmf_chunk_solve_woodbury`
    — matmuls contract over K, P x P solves), picked at TRACE time from
    the chunk's static shape; 0 disables.

    Returns ``fn(Y, T, rows, idx_pad, valid) -> T`` (jitted; T donated).
    """
    from .. import config
    from ..ops.als import get_solver

    mesh = mesh_ctx.mesh
    n = mesh_ctx.num_devices
    w = float(weight)
    K = num_components

    def chunk(Y, T, rows, idx_pad, valid):
        rpd_y = Y.shape[0] // n
        rpd_t = T.shape[0] // n
        C, Pp = idx_pad.shape
        Cn = C // n

        def device_chunk(Y_s, T_s, rows_rep, idx_loc, valid_loc):
            eye = jnp.eye(K, dtype=Y_s.dtype)
            A0 = jax.lax.psum(
                jnp.matmul(Y_s.T, Y_s,
                           preferred_element_type=jnp.float32),
                ROW_AXIS) + weight_decay * eye
            flat_all = jax.lax.all_gather(idx_loc.reshape(-1), ROW_AXIS,
                                          tiled=True)
            sub = _resolve_rows(Y_s, flat_all, rpd_y).reshape(Cn, Pp, -1)
            sub = sub * valid_loc[..., None].astype(Y_s.dtype)
            if Pp <= wb_max_p and w > 1.0:
                # Woodbury form (ops/als.py::woodbury_core) on the
                # collectively resolved rows; the replicated A0 inverse
                # is deterministic (same psum'd Gramian on every shard)
                # and trivial next to the chunk work (one K^3 per chunk)
                from ..ops.als import woodbury_core
                x = woodbury_core(sub, jnp.linalg.inv(A0), valid_loc,
                                  w, solver)
            else:
                A = A0[None] + (w - 1.0) * jnp.einsum(
                    "cpk,cpl->ckl", sub, sub,
                    preferred_element_type=jnp.float32)
                b = w * jnp.sum(sub, axis=1)
                x = get_solver(solver)(A, b)
                nonempty = jnp.any(valid_loc, axis=1, keepdims=True)
                x = jnp.where(nonempty, x, 0.0)
            x_all = jax.lax.all_gather(x, ROW_AXIS, tiled=True)  # (C, K)
            T_s = T_s.at[_owned_rows(rows_rep, rpd_t)].set(
                x_all, mode="drop", unique_indices=True)
            return T_s

        fn = jax.shard_map(
            device_chunk, mesh=mesh,
            in_specs=(P(ROW_AXIS, None), P(ROW_AXIS, None), P(),
                      P(ROW_AXIS, None), P(ROW_AXIS, None)),
            out_specs=P(ROW_AXIS, None), check_vma=False)
        return fn(Y, T, rows, idx_pad, valid)

    return jax.jit(chunk, donate_argnums=(1,))


def sharded_glove_epoch(mesh_ctx, optimizer, x_max, alpha, num_components,
                        num_central):
    """Explicit shard_map GloVe epoch (fused-bias mode) — the multi-device
    analogue of ``models.glove._glove_epoch``.

    The reference's GloVe Hogwild loop (`/root/reference/cymf/glove.pyx:151`)
    shares both tables in RAM; here the augmented central/context tables
    (``[w | b_c | 1]`` / ``[h | 1 | b_x]``) + AdaGrad accumulators are
    row-sharded, the co-occurrence batch is sharded over devices, and row
    exchange is the O(batch) all_gather/psum_scatter pattern.  Returns
    ``fn(Wc, Wx, ow, oh, c_steps_T, x_steps_T, n_counts_T, n_valid)``
    (batch arrays transposed to (B, S) so samples shard).
    """
    mesh = mesh_ctx.mesh
    n = mesh_ctx.num_devices
    K = num_components

    def epoch(Wc, Wx, ow, oh, c_steps, x_steps, n_counts, n_valid):
        Cpad = Wc.shape[0]
        Xpad = Wx.shape[0]
        rpd_c = Cpad // n
        rpd_x = Xpad // n
        width = Wc.shape[1]

        def device_epoch(Wc_s, Wx_s, ow_s, oh_s, c_st, x_st, n_st):
            def step(carry, xs):
                Wc_s, Wx_s, ow_s, oh_s, loss_acc = carry
                c_loc, x_loc, cnt = xs
                mf = (c_loc < num_central).astype(Wc_s.dtype)

                c_all = jax.lax.all_gather(c_loc, ROW_AXIS, tiled=True)
                x_all = jax.lax.all_gather(x_loc, ROW_AXIS, tiled=True)
                wc = _resolve_rows(Wc_s, c_all, rpd_c)
                hx = _resolve_rows(Wx_s, x_all, rpd_x)

                f = jnp.minimum(jnp.power(cnt / x_max, alpha), 1.0)
                diff = jnp.sum(wc * hx, axis=1) - jnp.log(cnt)
                loss = 0.5 * f * jnp.square(diff) * mf
                fd = (f * diff * mf)[:, None]
                col = jnp.arange(width)
                g_c = fd * hx * (col != K + 1)
                g_x = fd * wc * (col != K)

                gc_all = jax.lax.all_gather(g_c, ROW_AXIS, tiled=True)
                gx_all = jax.lax.all_gather(g_x, ROW_AXIS, tiled=True)
                Wc_s, ow_s = optimizer.update_dense(
                    Wc_s, ow_s, [(_owned_rows(c_all, rpd_c), gc_all)])
                Wx_s, oh_s = optimizer.update_dense(
                    Wx_s, oh_s, [(_owned_rows(x_all, rpd_x), gx_all)])
                loss_sum = jax.lax.psum(jnp.sum(loss), ROW_AXIS)
                return (Wc_s, Wx_s, ow_s, oh_s, loss_acc + loss_sum), None

            init = (Wc_s, Wx_s, ow_s, oh_s, jnp.zeros((), Wc_s.dtype))
            (Wc_s, Wx_s, ow_s, oh_s, loss), _ = jax.lax.scan(
                step, init, (c_st.T, x_st.T, n_st.T))
            return Wc_s, Wx_s, ow_s, oh_s, loss

        table = P(ROW_AXIS, None)
        batch = P(ROW_AXIS, None)  # (B, S): samples sharded
        rep = P()
        fn = jax.shard_map(
            device_epoch, mesh=mesh,
            in_specs=(table, table, table, table, batch, batch, batch),
            out_specs=(table, table, table, table, rep),
            check_vma=False)
        Wc, Wx, ow, oh, loss = fn(Wc, Wx, ow, oh, c_steps.T, x_steps.T,
                                  n_counts.T)
        return Wc, Wx, ow, oh, loss / jnp.maximum(
            n_valid, 1).astype(Wc.dtype)

    return jax.jit(epoch, donate_argnums=(0, 1, 2, 3))


def sharded_expomf_chunk(mesh_ctx, lam_y: float, weight_decay: float,
                         prefactor: float, num_components: int, solver: str,
                         mu_axis: str, num_real_rows: int,
                         num_real_cols: int):
    """Explicit shard_map ExpoMF E+M chunk — the multi-device analogue of
    ``models.expomf._expomf_chunk`` (the last trainer without a sharded
    path, VERDICT r3 #6).

    The reference densifies the U x I Exposure matrix and pranges over
    rows (`/root/reference/cymf/expomf.pyx:111,165-204`); the single-
    device rebuild recomputes each chunk's E block from (W0, H0).  Here
    the E block itself is partitioned over the mesh **by the other-side
    axis**: each device holds a row shard of the other-side tables, so
    its S/E slab is ``[C, Co/n]`` and the exposure-weighted Gramian
    ``A_c = lam_y * sum_i E_ci y_i y_i^T`` is a LOCAL einsum whose
    ``[C, K, K]`` partials ``psum_scatter`` straight onto the device
    that solves chunk row ``c`` — comm is O(C*K^2 + C*P*K), never
    O(table).  The chunk's target rows shard over devices for the
    batched Cholesky/LU exactly like ``sharded_wmf_chunk``.

    ``mu_axis``: "col" for the user sweep (mu term varies per item
    column, passed as a row-sharded ``[Co_pad]`` vector) or "row" for
    the item sweep (per chunk row, passed replicated ``[C]``).

    Returns ``fn(E_src, E_other, Y, mu_term, T, rows, idx_pad, valid)
    -> (T_new, e_colsum)`` (jitted) where ``e_colsum`` is the
    ``[Co_pad]`` row-sharded sum of E over the chunk's live rows (the
    mu update operand; all-zero for the item sweep caller to ignore).
    """
    from ..ops.als import get_solver

    if mu_axis not in ("col", "row"):
        raise ValueError("mu_axis must be 'col' or 'row'")
    mesh = mesh_ctx.mesh
    n = mesh_ctx.num_devices
    K = num_components
    lam = float(lam_y)
    pref = float(prefactor)
    ridge = float(weight_decay) / lam

    def chunk(E_src, E_other, Y, mu_term, T, rows, idx_pad, valid):
        rpd_src = E_src.shape[0] // n
        rpd_o = E_other.shape[0] // n
        C, Pp = idx_pad.shape
        Cn = C // n

        def device_chunk(Esrc_s, Eoth_s, Y_s, mu_s, T_s, rows_rep,
                         idx_loc, valid_loc):
            p = jax.lax.axis_index(ROW_AXIS)
            eye = jnp.eye(K, dtype=Y_s.dtype)

            # 1. chunk rows' source factors, replicated [C, K] (O(C*K))
            lidx = rows_rep - p * rpd_src
            owned = (lidx >= 0) & (lidx < rpd_src)
            w_rows = jax.lax.psum(
                jnp.where(owned[:, None],
                          Esrc_s[jnp.clip(lidx, 0, rpd_src - 1)], 0.0),
                ROW_AXIS)

            # 2. local E block [C, rpd_o] (expomf.pyx:134-137)
            S = jnp.matmul(w_rows, Eoth_s.T,
                           preferred_element_type=jnp.float32)
            nn = pref * jnp.exp(-lam * jnp.square(S) / 2.0)
            if mu_axis == "col":
                mu_b = mu_s[None, :]
            else:
                mu_b = mu_s[:, None]
            post = (nn + 1e-8) / (nn + 1e-8 + mu_b)

            # observed cells -> exposure 1, on this device's columns
            idx_all = jax.lax.all_gather(idx_loc, ROW_AXIS, tiled=True)
            valid_all = jax.lax.all_gather(valid_loc, ROW_AXIS,
                                           tiled=True)
            lcol = idx_all - p * rpd_o
            obs_idx = jnp.where(
                valid_all & (lcol >= 0) & (lcol < rpd_o), lcol, rpd_o)
            obs = jnp.zeros(S.shape, bool).at[
                jnp.arange(C)[:, None], obs_idx].set(True, mode="drop")
            E = jnp.where(obs, 1.0, post)
            col_live = ((jnp.arange(rpd_o) + p * rpd_o)
                        < num_real_cols).astype(E.dtype)
            E = E * col_live[None, :]
            row_live = (rows_rep < num_real_rows)
            e_colsum = jnp.sum(E * row_live[:, None], axis=0)  # [rpd_o]

            # 3. Gramian partials over local columns for ALL C rows;
            # psum_scatter hands each device the [Cn, K, K] blocks of
            # the chunk rows it solves (same C-order as idx_loc)
            A_part = lam * jnp.einsum(
                "ci,ik,il->ckl", E, Y_s, Y_s,
                preferred_element_type=jnp.float32)
            A_loc = jax.lax.psum_scatter(
                A_part, ROW_AXIS, scatter_dimension=0, tiled=True)
            A_loc = A_loc + ridge * eye[None]

            # 4. b over observed rows (E = 1 there, expomf.pyx:188-191)
            flat_all = idx_all.reshape(-1)
            sub = _resolve_rows(Y_s, flat_all, rpd_o).reshape(Cn, Pp, -1)
            sub = sub * valid_loc[..., None].astype(Y_s.dtype)
            b = lam * jnp.sum(sub, axis=1)
            x = get_solver(solver)(A_loc, b)
            nonempty = jnp.any(valid_loc, axis=1, keepdims=True)
            x = jnp.where(nonempty, x, 0.0)
            x_all = jax.lax.all_gather(x, ROW_AXIS, tiled=True)  # (C, K)
            T_s = T_s.at[_owned_rows(rows_rep, rpd_src)].set(
                x_all, mode="drop", unique_indices=True)
            return T_s, e_colsum

        table = P(ROW_AXIS, None)
        mu_spec = P(ROW_AXIS) if mu_axis == "col" else P()
        fn = jax.shard_map(
            device_chunk, mesh=mesh,
            in_specs=(table, table, table, mu_spec, table, P(),
                      table, table),
            out_specs=(table, P(ROW_AXIS)), check_vma=False)
        return fn(E_src, E_other, Y, mu_term, T, rows, idx_pad, valid)

    return jax.jit(chunk)


def sharded_glove_kfold_epoch(mesh_ctx, optimizer, x_max, alpha,
                              num_components, num_central):
    """Explicit shard_map GloVe epoch for ``bias_mode="kfold"`` — the
    reference-exact bias rule (`/root/reference/cymf/model.pyx:195-204`
    emits the bias gradient once per latent dimension: K consecutive
    AdaGrad updates per sample, applied here in closed form exactly as
    ``models.glove._bias_kfold_update``).

    Layout: K-wide embedding tables + separate (V, 1) bias/accumulator
    columns, all row-sharded; the co-occurrence batch sharded over
    devices.  The bias dedup runs on the ALL-GATHERED (tiny) row/grad
    streams identically on every device, and each device applies the
    closed-form update only to the bias rows it owns — bit-comparable
    with the single-device path.  Returns
    ``fn(Wc, Wx, bc, bx, ow, oh, abc, abx, c_steps_T, x_steps_T,
    n_counts_T, n_valid)``.
    """
    from ..ops.segment import dedup_rows

    mesh = mesh_ctx.mesh
    n = mesh_ctx.num_devices
    K = num_components
    lr = optimizer.learning_rate

    def epoch(Wc, Wx, bc, bx, ow, oh, abc, abx, c_steps, x_steps,
              n_counts, n_valid):
        Cpad = Wc.shape[0]
        Xpad = Wx.shape[0]
        rpd_c = Cpad // n
        rpd_x = Xpad // n

        def bias_kfold_local(bias_s, accum_s, rows_all, g_all, rpd,
                             drop_global, presorted):
            rows_d, g_d = dedup_rows(rows_all, g_all[:, None],
                                     drop_global, presorted=presorted)
            lrows = _owned_rows(rows_d, rpd)
            crows = jnp.clip(lrows, 0, rpd - 1)
            a0 = accum_s[crows]                             # (B, 1)
            t = jnp.arange(1, K + 1, dtype=bias_s.dtype)
            denom = jnp.sqrt(a0 + t[None, :] * jnp.square(g_d))
            delta = -lr * g_d[:, :1] * jnp.sum(1.0 / denom, axis=1,
                                               keepdims=True)
            accum_s = accum_s.at[lrows].set(
                a0 + K * jnp.square(g_d[:, :1]), mode="drop",
                unique_indices=True)
            bias_s = bias_s.at[lrows].add(delta, mode="drop",
                                          unique_indices=True)
            return bias_s, accum_s

        def device_epoch(Wc_s, Wx_s, bc_s, bx_s, ow_s, oh_s, abc_s,
                         abx_s, c_st, x_st, n_st):
            def step(carry, xs):
                (Wc_s, Wx_s, bc_s, bx_s, ow_s, oh_s, abc_s, abx_s,
                 loss_acc) = carry
                c_loc, x_loc, cnt = xs
                mf = (c_loc < num_central).astype(Wc_s.dtype)

                c_all = jax.lax.all_gather(c_loc, ROW_AXIS, tiled=True)
                x_all = jax.lax.all_gather(x_loc, ROW_AXIS, tiled=True)
                wc = _resolve_rows(Wc_s, c_all, rpd_c)
                hx = _resolve_rows(Wx_s, x_all, rpd_x)
                bcv = _resolve_rows(bc_s, c_all, rpd_c)[:, 0]
                bxv = _resolve_rows(bx_s, x_all, rpd_x)[:, 0]

                f = jnp.minimum(jnp.power(cnt / x_max, alpha), 1.0)
                diff = (jnp.sum(wc * hx, axis=1) + bcv + bxv
                        - jnp.log(cnt))
                loss = 0.5 * f * jnp.square(diff) * mf
                fd = (f * diff * mf)[:, None]
                g_c = fd * hx
                g_x = fd * wc

                gc_all = jax.lax.all_gather(g_c, ROW_AXIS, tiled=True)
                gx_all = jax.lax.all_gather(g_x, ROW_AXIS, tiled=True)
                Wc_s, ow_s = optimizer.update_dense(
                    Wc_s, ow_s, [(_owned_rows(c_all, rpd_c), gc_all)])
                Wx_s, oh_s = optimizer.update_dense(
                    Wx_s, oh_s, [(_owned_rows(x_all, rpd_x), gx_all)])

                fd_all = jax.lax.all_gather(fd[:, 0], ROW_AXIS,
                                            tiled=True)
                # the host pre-sorts each batch by central word and
                # sharding slices it contiguously, so the gathered
                # stream is globally sorted (presorted dedup fast path)
                bc_s, abc_s = bias_kfold_local(
                    bc_s, abc_s, c_all, fd_all, rpd_c, Cpad,
                    presorted=True)
                bx_s, abx_s = bias_kfold_local(
                    bx_s, abx_s, x_all, fd_all, rpd_x, Xpad,
                    presorted=False)
                loss_sum = jax.lax.psum(jnp.sum(loss), ROW_AXIS)
                return (Wc_s, Wx_s, bc_s, bx_s, ow_s, oh_s, abc_s,
                        abx_s, loss_acc + loss_sum), None

            init = (Wc_s, Wx_s, bc_s, bx_s, ow_s, oh_s, abc_s, abx_s,
                    jnp.zeros((), Wc_s.dtype))
            (Wc_s, Wx_s, bc_s, bx_s, ow_s, oh_s, abc_s, abx_s,
             loss), _ = jax.lax.scan(step, init,
                                     (c_st.T, x_st.T, n_st.T))
            return (Wc_s, Wx_s, bc_s, bx_s, ow_s, oh_s, abc_s, abx_s,
                    loss)

        table = P(ROW_AXIS, None)
        batch = P(ROW_AXIS, None)  # (B, S): samples sharded
        rep = P()
        fn = jax.shard_map(
            device_epoch, mesh=mesh,
            in_specs=(table,) * 8 + (batch, batch, batch),
            out_specs=(table,) * 8 + (rep,), check_vma=False)
        Wc, Wx, bc, bx, ow, oh, abc, abx, loss = fn(
            Wc, Wx, bc, bx, ow, oh, abc, abx, c_steps.T, x_steps.T,
            n_counts.T)
        return Wc, Wx, bc, bx, ow, oh, abc, abx, loss / jnp.maximum(
            n_valid, 1).astype(Wc.dtype)

    return jax.jit(epoch, donate_argnums=tuple(range(8)))


def sharded_packed_bpr_epoch(mesh_ctx, opt_name, lr, weight_decay, K,
                             rw, rh, wrows_w, wrows_h, interpret,
                             precision="split"):
    """Explicit shard_map PACKED BPR epoch — the multi-device form of the
    flagship engine (``ops.packed_epoch.packed_bpr_epoch``, v4 pipeline),
    so a mesh runs the fast fused-kernel path instead of falling back to
    the XLA batch engine (measured 39.9M vs 19.5M int/s per chip,
    docs/PERF.md).

    Partition (see ``ops.packed_epoch.shard_slices``): the packed W table
    (the big one — users) is row-sharded; each step's u-sorted sample
    stream splits into n CONTIGUOUS shard slices, so W gathers, the fused
    sample kernel, the W-side windowed accumulation, and the W optimizer
    pass are all fully local — zero W-side communication.  The logical H
    table (items — the SMALL table in recommendation workloads, ~5x
    smaller than W on the MovieLens family) is REPLICATED; each device
    accumulates its slice's H gradients over the full catalog and ONE
    ``psum`` of that (rh, 128) buffer per step merges them, after which
    the (deterministic) H optimizer pass runs replicated.  Comm per step
    is therefore a single item-table-sized all-reduce + a scalar loss —
    the deliberate inverse of ``sharded_bpr_epoch``'s O(batch)
    row-exchange discipline, trading a small-table collective for fully
    local gathers and kernels (at ML-20M shapes: 13.8 MB/step on ICI vs
    3 all_gathers + 3 psum_scatters of (B, 128) = ~200 MB/step).

    The negative stream is drawn GLOBALLY on the host before slicing
    (``prep_shard_epoch``), so the sample stream — and hence the fit —
    is mesh-size-invariant up to float summation order.

    Returns ``fn(Wp, Hp, ow, oh, u, i, si, rowsi, wini, j, mf, sj,
    rowsj, winj, winw, n_valid)`` where Wp/ow are row-sharded
    ``(rw, 128)`` trees, Hp/oh replicated ``(rh, 128)`` trees, and every
    stream array carries a leading shard axis ``n`` (from
    ``prep_shard_static`` / ``prep_shard_epoch``).
    """
    from ..ops import packed as pk
    from ..ops.fused_sample import bpr_sample_phase, decorate
    from ..ops.packed_epoch import (TILE, _fold_rows, _pad_lanes,
                                    make_packed_optimizer)
    from ..ops.sorted_accum import sorted_accum, sorted_accum_dual

    mesh = mesh_ctx.mesh
    n = mesh_ctx.num_devices
    opt = make_packed_optimizer(opt_name, lr)
    wd = float(weight_decay)
    s = pk.num_slots(K)
    cb = pk.count_base(K)
    rw_l = rw // n
    payb = jnp.arange(pk.LANES) < K
    payf = payb.astype(jnp.float32)

    def epoch(Wp, Hp, ow, oh, u, i, si, rowsi, wini, j, mf, sj, rowsj,
              winj, winw, n_valid):

        def device_epoch(Wp_l, Hp, ow_l, oh, u, i, si, rowsi, wini, j,
                         mf, sj, rowsj, winj, winw):
            # stream args arrive (1, S, ...) — drop the shard axis
            u, i, si, rowsi, wini, j, mf, sj, rowsj, winj, winw = (
                a[0] for a in (u, i, si, rowsi, wini, j, mf, sj, rowsj,
                               winj, winw))

            def step(carry, xs):
                Wp_l, Hp, ow_l, oh, loss_acc = carry
                u, i, si, rowsi, wi, j, mf, sj, rowsj, wj, ww = xs
                mf = mf.astype(jnp.float32)
                phys, slot = u // s, u % s
                # local gathers: shard slices guarantee every sample's W
                # row lives here (padding sentinel rw_l clamps, mask 0)
                Du = decorate(Wp_l.at[jnp.minimum(phys, rw_l - 1)].get(
                    indices_are_sorted=True, mode="promise_in_bounds"),
                    slot, mf, K)
                SW, Q, lossp = bpr_sample_phase(
                    Du, Hp[i], Hp[j], K=K, wd=wd, interpret=interpret)
                Aw = sorted_accum(
                    _fold_rows(phys), SW, ww[0], ww[1], r_pad=rw_l,
                    wrows=wrows_w, tile=TILE, interpret=interpret,
                    precision=precision)
                gw, nw = pk.split_counts(Aw, K)
                nwE = pk.expand_counts(nw, K)
                gbw = _pad_lanes(-gw + wd * nwE * Wp_l[:, :cb])
                mw = _pad_lanes(nwE > 0)
                Wp_l, ow_l = opt.update(Wp_l, ow_l, gbw, mw, K)

                D = sorted_accum_dual(
                    rowsi, Q[si], wi[0], wi[1], rowsj, Q[sj], wj[0],
                    wj[1], r_pad=rh, neg_lanes=K, wrows=wrows_h,
                    tile=TILE, interpret=interpret, precision=precision)
                # THE collective: merge per-shard H gradients + counts
                D = jax.lax.psum(D, ROW_AXIS)
                loss_step = jax.lax.psum(lossp[0, 0], ROW_AXIS)
                nh = D[:, K:K + 1]
                gbh = (D + wd * nh * Hp) * payf
                mh = (nh > 0) & payb
                # replicated-deterministic H update (same psum'd inputs
                # on every device -> shards stay bit-identical)
                Hp, oh = opt.update(Hp, oh, gbh, mh, K)
                return (Wp_l, Hp, ow_l, oh, loss_acc + loss_step), None

            init = (Wp_l, Hp, ow_l, oh, jnp.zeros((), jnp.float32))
            (Wp_l, Hp, ow_l, oh, loss), _ = jax.lax.scan(
                step, init, (u, i, si, rowsi, wini, j, mf, sj, rowsj,
                             winj, winw))
            return Wp_l, Hp, ow_l, oh, loss

        table = P(ROW_AXIS, None)
        stream = P(ROW_AXIS)
        rep = P()
        fn = jax.shard_map(
            device_epoch, mesh=mesh,
            in_specs=(table, rep, table, rep) + (stream,) * 11,
            out_specs=(table, rep, table, rep, rep),
            check_vma=False)
        Wp, Hp, ow, oh, loss = fn(Wp, Hp, ow, oh, u, i, si, rowsi, wini,
                                  j, mf, sj, rowsj, winj, winw)
        return Wp, Hp, ow, oh, loss / jnp.maximum(
            n_valid, 1).astype(jnp.float32)

    return jax.jit(epoch, donate_argnums=(0, 1, 2, 3))


def sharded_packed_glove_epoch(mesh_ctx, lr, K, rw, rh, wrows_w, wrows_h,
                               interpret, precision="split"):
    """Explicit shard_map PACKED GloVe epoch — the multi-device form of
    ``ops.glove_epoch.packed_glove_epoch``, partitioned exactly like
    :func:`sharded_packed_bpr_epoch`: the packed augmented central table
    is row-sharded with shard-contiguous sample slices (every central
    gather, the fused sample kernel, the central accumulation and its
    AdaGrad pass are fully local), the logical augmented context table is
    replicated and merged with ONE ``(rh, 128)`` psum per step.  GloVe
    has no per-epoch draws, so every stream (from
    ``prep_glove_shard_static``) is static for the whole fit and the
    fit is mesh-size-invariant up to float summation order.

    Returns ``fn(Zc, Zx, oc, ox, c, x, mf, f, lc, sx, rowsx, winx,
    winw, n_valid)`` where Zc/oc are row-sharded ``(rw, 128)`` trees,
    Zx/ox replicated ``(rh, 128)`` trees, and every stream carries a
    leading shard axis ``n``.
    """
    from ..ops import packed as pk
    from ..ops.glove_epoch import decorate_x, glove_sample_phase
    from ..ops.fused_sample import decorate
    from ..ops.packed_epoch import (TILE, PackedAdaGrad, _fold_rows,
                                    _pad_lanes)
    from ..ops.sorted_accum import sorted_accum

    mesh = mesh_ctx.mesh
    n = mesh_ctx.num_devices
    Kp = K + 2
    opt = PackedAdaGrad(lr)
    s = pk.num_slots(Kp)
    cb = pk.count_base(Kp)
    rw_l = rw // n
    lane = jnp.arange(128)
    freeze_c = jnp.pad(
        ((lane[:cb] % Kp) != K + 1).astype(jnp.float32)[None, :],
        ((0, 0), (0, 128 - cb)))
    freeze_x = ((lane < Kp) & (lane != K)).astype(jnp.float32)[None, :]

    def epoch(Zc, Zx, oc, ox, c, x, mf, f, lc, sx, rowsx, winx, winw,
              n_valid):

        def device_epoch(Zc_l, Zx, oc_l, ox, c, x, mf, f, lc, sx, rowsx,
                         winx, winw):
            c, x, mf, f, lc, sx, rowsx, winx, winw = (
                a[0] for a in (c, x, mf, f, lc, sx, rowsx, winx, winw))

            def step(carry, xs):
                Zc_l, Zx, oc_l, ox, loss_acc = carry
                c, x, mf, f, lc, sx, rowsx, wx, ww = xs
                mf = mf.astype(jnp.float32)
                phys, slot = c // s, c % s
                Du = decorate(Zc_l.at[jnp.minimum(phys, rw_l - 1)].get(
                    indices_are_sorted=True, mode="promise_in_bounds"),
                    slot, mf, Kp)
                Dx = decorate_x(Zx.at[x].get(mode="promise_in_bounds"),
                                f, lc, Kp)
                SW, Q, lossp = glove_sample_phase(Du, Dx, Kp=Kp,
                                                  interpret=interpret)
                Ac = sorted_accum(
                    _fold_rows(phys), SW, ww[0], ww[1], r_pad=rw_l,
                    wrows=wrows_w, tile=TILE, interpret=interpret,
                    precision=precision)
                gc, _ = pk.split_counts(Ac, Kp)
                Zc_l, oc_l = opt.update(Zc_l, oc_l,
                                        _pad_lanes(gc) * freeze_c,
                                        None, Kp)
                D = sorted_accum(
                    rowsx, Q[sx], wx[0], wx[1], r_pad=rh, wrows=wrows_h,
                    tile=TILE, interpret=interpret, precision=precision)
                # THE collective: merge per-shard context gradients
                D = jax.lax.psum(D, ROW_AXIS)
                loss_step = jax.lax.psum(lossp[0, 0], ROW_AXIS)
                # replicated-deterministic context update
                Zx, ox = opt.update(Zx, ox, D * freeze_x, None, Kp)
                return (Zc_l, Zx, oc_l, ox, loss_acc + loss_step), None

            init = (Zc_l, Zx, oc_l, ox, jnp.zeros((), jnp.float32))
            (Zc_l, Zx, oc_l, ox, loss), _ = jax.lax.scan(
                step, init, (c, x, mf, f, lc, sx, rowsx, winx, winw))
            return Zc_l, Zx, oc_l, ox, loss

        table = P(ROW_AXIS, None)
        stream = P(ROW_AXIS)
        rep = P()
        fn = jax.shard_map(
            device_epoch, mesh=mesh,
            in_specs=(table, rep, table, rep) + (stream,) * 9,
            out_specs=(table, rep, table, rep, rep),
            check_vma=False)
        Zc, Zx, oc, ox, loss = fn(Zc, Zx, oc, ox, c, x, mf, f, lc, sx,
                                  rowsx, winx, winw)
        return Zc, Zx, oc, ox, loss / jnp.maximum(
            n_valid, 1).astype(jnp.float32)

    return jax.jit(epoch, donate_argnums=(0, 1, 2, 3))


def sharded_wide_bpr_epoch(mesh_ctx, opt_name, lr, weight_decay, K,
                           rw, rh, wrows, interpret, precision="split"):
    """Explicit shard_map WIDE BPR epoch — the multi-device form of the
    K >= 128 fused engine (``ops.wide_epoch.wide_bpr_epoch``), closing
    BASELINE config 5's pod-slice path ("BPR on ML-20M, d=256,
    row-sharded tables"): round-4's wide engine was single-device and
    multi-device d >= 128 fits fell back to the sharded XLA epoch
    (5.83M vs 8.96M int/s at d=256 on one chip, docs/PERF.md).

    Partition mirrors :func:`sharded_packed_bpr_epoch` exactly: the wide
    ``(rw, Kp)`` W table is row-sharded with shard-contiguous u-sorted
    sample slices (W gathers, the windowed W accumulation and the W
    optimizer pass are all fully local — zero W-side communication); the
    wide H table is replicated, each device accumulates its slice's
    H gradients over the full catalog with the dual-stream kernel, and
    ONE ``psum`` of that ``(rh, Kp + 128)`` buffer per step merges them
    (~27 MB/step over ICI at ML-20M d=256 — cheap next to the ~200
    MB/step of the row-exchange XLA discipline), after which the
    deterministic H optimizer pass runs replicated.  Negative streams
    are drawn GLOBALLY before slicing (``prep_shard_epoch``), so fits
    are mesh-size-invariant up to float summation order — the sharded
    analogue of the reference's Hogwild loop
    (`/root/reference/cymf/bpr.pyx:162-169`) at d >= 128.

    Returns ``fn(W, H, ow, oh, u, rowsu, winw, i, si, rowsi, wini, j,
    mf, sj, rowsj, winj, mi, mj, n_valid)`` where W/ow are row-sharded
    ``(rw, Kp)`` trees, H/oh replicated ``(rh, Kp)`` trees, and every
    stream array carries a leading shard axis ``n`` (from
    ``ops.wide_epoch.prep_shard_static_wide`` / ``prep_shard_epoch`` +
    ``wide_shard_masks``).
    """
    from ..ops.packed_epoch import TILE, make_packed_optimizer
    from ..ops.sorted_accum import sorted_accum, sorted_accum_dual

    mesh = mesh_ctx.mesh
    n = mesh_ctx.num_devices
    opt = make_packed_optimizer(opt_name, lr)
    wd = jnp.float32(weight_decay)
    rw_l = rw // n

    def epoch(W, H, ow, oh, u, rowsu, winw, i, si, rowsi, wini, j, mf,
              sj, rowsj, winj, mi, mj, n_valid):
        Kp = W.shape[1]
        lane = jnp.arange(Kp)
        payf = (lane < K).astype(jnp.float32)[None, :]
        payb = (lane < K)[None, :]

        def device_epoch(W_l, H, ow_l, oh, u, rowsu, winw, i, si, rowsi,
                         wini, j, mf, sj, rowsj, winj, mi, mj):
            # stream args arrive (1, S, ...) — drop the shard axis
            (u, rowsu, winw, i, si, rowsi, wini, j, mf, sj, rowsj, winj,
             mi, mj) = (a[0] for a in (u, rowsu, winw, i, si, rowsi,
                                       wini, j, mf, sj, rowsj, winj, mi,
                                       mj))

            def step(carry, xs):
                W_l, H, ow_l, oh, loss_acc = carry
                (u, rowsu, ww, i, si, rowsi, wi, j, mf, sj, rowsj, wj,
                 mi, mj) = xs
                mfold = mf.reshape(rowsu.shape)
                # masked/padding samples -> sentinel rows (no window)
                rowsu_m = jnp.where(mfold > 0, rowsu, rw_l)
                rowsi_m = jnp.where(mi > 0, rowsi, rh)
                rowsj_m = jnp.where(mj > 0, rowsj, rh)
                mff = mf.astype(jnp.float32)

                # local gather: shard slices guarantee every sample's W
                # row lives here (sentinel rw_l clamps, mask 0)
                wu = W_l.at[jnp.minimum(u, rw_l - 1)].get(
                    indices_are_sorted=True, mode="promise_in_bounds")
                hi, hj = H[i], H[j]
                x = jnp.sum(wu * (hi - hj), axis=1, keepdims=True)
                sigm = jax.nn.sigmoid(-x) * mff[:, None]
                SW = sigm * (hi - hj)
                Q = sigm * wu
                l2 = jnp.sum(wu * wu + hi * hi + hj * hj, axis=1)
                loss_p = jnp.sum(
                    (-jax.nn.log_sigmoid(x[:, 0]) + wd * l2) * mff)

                Aw = sorted_accum(
                    rowsu_m, SW, ww[0], ww[1], r_pad=rw_l, wrows=wrows,
                    tile=TILE, interpret=interpret, precision=precision,
                    count_lanes=True)
                nw = Aw[:, Kp:Kp + 1]
                W_l, ow_l = opt.update(
                    W_l, ow_l, (-Aw[:, :Kp] + wd * nw * W_l) * payf,
                    (nw > 0) & payb, K)

                D = sorted_accum_dual(
                    rowsi_m, Q[si], wi[0], wi[1], rowsj_m, Q[sj], wj[0],
                    wj[1], r_pad=rh, neg_lanes=Kp, wrows=wrows,
                    tile=TILE, interpret=interpret, precision=precision,
                    count_lanes=True)
                # THE collective: merge per-shard H gradients + counts
                D = jax.lax.psum(D, ROW_AXIS)
                loss_step = jax.lax.psum(loss_p, ROW_AXIS)
                nh = D[:, Kp:Kp + 1]
                # replicated-deterministic H update (same psum'd inputs
                # on every device -> shards stay bit-identical)
                H, oh = opt.update(
                    H, oh, (D[:, :Kp] + wd * nh * H) * payf,
                    (nh > 0) & payb, K)
                return (W_l, H, ow_l, oh, loss_acc + loss_step), None

            init = (W_l, H, ow_l, oh, jnp.zeros((), jnp.float32))
            (W_l, H, ow_l, oh, loss), _ = jax.lax.scan(
                step, init, (u, rowsu, winw, i, si, rowsi, wini, j, mf,
                             sj, rowsj, winj, mi, mj))
            return W_l, H, ow_l, oh, loss

        table = P(ROW_AXIS, None)
        stream = P(ROW_AXIS)
        rep = P()
        fn = jax.shard_map(
            device_epoch, mesh=mesh,
            in_specs=(table, rep, table, rep) + (stream,) * 14,
            out_specs=(table, rep, table, rep, rep),
            check_vma=False)
        W, H, ow, oh, loss = fn(W, H, ow, oh, u, rowsu, winw, i, si,
                                rowsi, wini, j, mf, sj, rowsj, winj, mi,
                                mj)
        return W, H, ow, oh, loss / jnp.maximum(
            n_valid, 1).astype(jnp.float32)

    return jax.jit(epoch, donate_argnums=(0, 1, 2, 3))
