"""Bayesian Personalized Ranking (Rendle et al. 2009) — TPU-native trainer.

Behavioural spec from `/root/reference/cymf/bpr.pyx` + `model.pyx:37-87`:
per observed (user, positive) interaction, draw one uniform negative, skip it
if it is a known positive, and descend the pairwise loss

    L = -log(sigmoid(w_u . (h_i - h_j))) + wd * (|w_u|^2 + |h_i|^2 + |h_j|^2)

with gradients exactly as in `model.pyx:80-87` (weight decay folded into the
gradient, no factor 2).

TPU-native redesign (not a port):

* The Hogwild ``prange`` over single samples (`bpr.pyx:162`) becomes a
  ``lax.scan`` over minibatches inside one jitted epoch: each step gathers
  the touched embedding rows, computes the batch of pairwise losses on the
  VPU, combines duplicate rows by segment-sum, and applies one synchronous
  sparse optimizer update (`cymf_tpu.optim`).  One compile per fit; zero
  per-step dispatch overhead.
* Negative sampling runs inside jit with counter-based ``jax.random``;
  collisions with known positives are *masked out* (weight 0), the
  fixed-shape equivalent of the reference's skip (`bpr.pyx:166-167`).
  Membership tests are vectorized binary searches over the CSR index array.
* Tables are row-sharded over the device mesh; batches are sharded over the
  same axis.  XLA inserts the gather/scatter collectives.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from sklearn import utils as sk_utils

from ..ops.hashset import build_pair_hashset, hashset_contains
from ..optim import make_optimizer
from .base import MFTrainerBase, PersistenceMixin, as_csr


PAD_USER = np.int32(2**31 - 1)  # padding sentinel: sorts last, OOB-dropped


def _load_ckpt_raw(path):
    """Engine-agnostic checkpoint read: raw flat leaf dict + epoch.

    BPR's two engines store state under different schemas — logical
    tables + ``ow``/``oh`` optimizer leaves (XLA batch engine) vs
    packed-layout ``owp``/``ohp`` leaves (packed engine) — and either may
    resume a checkpoint the other wrote, so resume starts from the raw
    dict and converts (`utils/checkpoint.py` handles the same-schema
    fast path elsewhere)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    epoch = int(flat.pop("__epoch__", -1))
    for k in list(flat):
        if k.startswith("__meta__/"):
            flat.pop(k)
    return flat, epoch


def _restore_opt_state(flat, native_prefix, other_prefix, template,
                       convert, paymask, place, repad=None):
    """Rebuild one table's optimizer-state dict from checkpoint leaves.

    Leaves under ``native_prefix`` (this engine's own layout) load
    verbatim when shapes match; on a row-padding mismatch (checkpoint
    written under a different mesh/device count) they run through
    ``repad`` (same-layout slice + re-pad, the conversion the tables
    themselves get) and splice into ``template`` where ``paymask`` is
    True.  Leaves under ``other_prefix`` run through ``convert`` (the
    cross-engine layout transform) with the same splice — positions
    outside the payload keep their initializer values (e.g. AdaGrad's
    ones on packed count/dead lanes).  ``place`` devices the final array
    (mesh sharding on the XLA path).
    """
    out = {}
    for sub, tleaf in template.items():
        nk, ok = f"{native_prefix}/{sub}", f"{other_prefix}/{sub}"
        if nk in flat:
            arr = np.asarray(flat[nk])
            if arr.shape != np.shape(tleaf):
                # repad only heals ROW-count mismatches (same layout,
                # different mesh/device padding); any trailing-dim
                # difference is a genuinely different layout/version
                if repad is None or arr.ndim != np.ndim(tleaf) \
                        or arr.shape[1:] != np.shape(tleaf)[1:]:
                    raise ValueError(
                        f"checkpoint leaf {nk!r} has shape {arr.shape}, "
                        f"expected {np.shape(tleaf)} — written by an "
                        "incompatible layout/version")
                arr = np.where(paymask, repad(arr), np.asarray(tleaf))
        elif ok in flat:
            arr = np.where(paymask, convert(np.asarray(flat[ok])),
                           np.asarray(tleaf))
        else:
            raise KeyError(
                f"checkpoint has neither {nk!r} nor {ok!r} — not a BPR "
                "checkpoint for this optimizer")
        out[sub] = place(arr.astype(np.asarray(tleaf).dtype), tleaf)
    return out


def _place_like(arr, tleaf):
    """Device-put honoring the template leaf's sharding when present."""
    if hasattr(tleaf, "sharding"):
        return jax.device_put(arr, tleaf.sharding)
    return jnp.asarray(arr)


def _packed_resume_state(flat, U, I, K, mult_w, wrows_h, ow, oh,
                         place_w, place_h):
    """Rebuild packed-engine device state from a raw checkpoint dict
    (either engine's schema — see `_load_ckpt_raw`) under W row padding
    ``mult_w`` and H row padding ``wrows_h``.  ``place_w``/``place_h``
    put the rebuilt arrays on device (identity placement for the
    single-device engine; table/replicated shardings for the sharded
    one).  Returns ``(Wp, Hp, ow, oh)``."""
    from ..ops import packed as pk

    # tables: both engine schemas store logical rows
    Wp = place_w(pk.pack_array(np.asarray(flat["W"])[:U], K,
                               multiple=mult_w))
    Hp = place_h(pk.pack_logical(np.asarray(flat["H"])[:I], K,
                                 multiple=wrows_h))

    def pack_w(a):  # logical (>=U, K) -> packed (rw, 128)
        return pk.pack_array(a[:U], K, multiple=mult_w)

    def pack_h(a):  # logical (>=I, K) -> logical-layout (rh, 128)
        return pk.pack_logical(a[:I], K, multiple=wrows_h)

    mpay_w = pk.pack_array(np.ones((U, K), np.float32), K,
                           multiple=mult_w) > 0
    mpay_h = pk.pack_logical(np.ones((I, K), np.float32), K,
                             multiple=wrows_h) > 0
    s_k = pk.num_slots(K)

    def repad_wp(a):  # packed layout under a different row pad
        return pk.pack_array(a[:, :s_k * K].reshape(-1, K)[:U], K,
                             multiple=mult_w)

    def repad_hp(a):  # logical layout under a different row pad
        return pk.pack_logical(a[:I, :K], K, multiple=wrows_h)

    ow = _restore_opt_state(flat, "owp", "ow", ow, pack_w, mpay_w,
                            lambda a, t: place_w(a), repad=repad_wp)
    oh = _restore_opt_state(flat, "ohp", "oh", oh, pack_h, mpay_h,
                            lambda a, t: place_h(a), repad=repad_hp)
    return Wp, Hp, ow, oh


def choose_update_mode(mode: str, batch_rows: int, table_rows: int) -> str:
    """'auto' resolves to dense when the batch covers enough of the table
    that a full-table pass is cheaper than sorted row-scatters."""
    if mode != "auto":
        return mode
    return "dense" if batch_rows * 16 >= table_rows else "sparse"


@functools.lru_cache(maxsize=16)
def _sharded_packed_epoch_jit(mesh, opt_name: str, lr: float, wd: float,
                              K: int, rw: int, rh: int, wrows_w: int,
                              wrows_h: int, interpret: bool):
    """Cached jitted shard_map PACKED epoch per (mesh, config) — like
    :func:`_sharded_epoch_jit`, repeated fits (warm starts, HPO sweeps)
    must not pay a fresh remote compile."""
    from ..parallel.shard_step import sharded_packed_bpr_epoch
    return sharded_packed_bpr_epoch(mesh, opt_name, lr, wd, K, rw, rh,
                                    wrows_w, wrows_h, interpret)


@functools.lru_cache(maxsize=16)
def _sharded_wide_epoch_jit(mesh, opt_name: str, lr: float, wd: float,
                            K: int, rw: int, rh: int, wrows: int,
                            interpret: bool):
    """Cached jitted shard_map WIDE epoch per (mesh, config) — the
    K >= 128 analogue of :func:`_sharded_packed_epoch_jit`."""
    from ..parallel.shard_step import sharded_wide_bpr_epoch
    return sharded_wide_bpr_epoch(mesh, opt_name, lr, wd, K, rw, rh,
                                  wrows, interpret)


@functools.lru_cache(maxsize=16)
def _sharded_epoch_jit(mesh, opt_name: str, lr: float, wd: float,
                       num_users: int, num_items: int):
    """Cached (optimizer, jitted shard_map epoch) per (mesh, config) —
    the multi-device analogue of :func:`_bpr_epoch_jit`; repeated fits
    (warm starts, HPO sweeps) would otherwise pay a full remote
    trace+compile per call (30s-10min through the dev relay)."""
    from ..parallel.shard_step import sharded_bpr_epoch
    opt = make_optimizer(opt_name, lr)
    return opt, sharded_bpr_epoch(mesh, opt, wd, num_users, num_items)


@functools.lru_cache(maxsize=64)
def _bpr_epoch_jit(opt_name: str, lr: float, wd: float, num_users: int,
                   num_items: int, mode: str):
    """Cached (optimizer, jitted epoch) per static config — repeated fits
    (warm starts, HPO sweeps) reuse the compiled executable instead of
    recompiling per call."""
    opt = make_optimizer(opt_name, lr)
    fn = jax.jit(
        functools.partial(_bpr_epoch, optimizer=opt, weight_decay=wd,
                          num_users=num_users, num_items=num_items,
                          update_mode=mode, u_presorted=True),
        donate_argnums=(0, 1, 2, 3))
    return opt, fn


def _bpr_epoch(W, H, opt_w, opt_h, u_steps, i_steps, hs, n_valid, key, *,
               optimizer, weight_decay, num_users, num_items,
               update_mode="dense", u_presorted=False):
    """One epoch: scan over minibatch steps. Returns new state + mean loss.

    ``update_mode``:
      * "dense"  — scatter-add per-sample gradients into a table-shaped
        buffer, then one masked full-table optimizer pass.  Duplicates
        combine natively (no sort).  Fastest when the batch touches a
        sizable fraction of the table.
      * "sparse" — sort-dedup + row-scatter updates; O(batch) memory
        traffic, for very large catalogs.
    Both produce identical updates (one step per touched row with the
    summed gradient).
    """
    S, B = u_steps.shape
    wd = jnp.asarray(weight_decay, W.dtype)

    def step(carry, xs):
        W, H, opt_w, opt_h, loss_acc = carry
        u, i, sidx = xs
        skey = jax.random.fold_in(key, sidx)
        j = jax.random.randint(skey, (B,), 0, num_items, dtype=u.dtype)
        # padding samples carry the PAD_USER sentinel (sorts last, survives
        # the in-batch user sort; OOB scatters are dropped by XLA)
        in_data = u < num_users
        collide = hashset_contains(hs, u, j)
        mask = in_data & ~collide
        mf = mask.astype(W.dtype)[:, None]

        wu, hi, hj = W[u], H[i], H[j]
        x = jnp.sum(wu * (hi - hj), axis=1, keepdims=True)
        sig = jax.nn.sigmoid(-x)  # 1/(1+e^x), cf. model.pyx:78
        # gradients per model.pyx:81-83 (decay inside the gradient)
        g_wu = -(sig * (hi - hj) - wd * wu) * mf
        g_hi = -(sig * wu - wd * hi) * mf
        g_hj = -(-sig * wu - wd * hj) * mf
        l2 = (jnp.sum(jnp.square(wu), axis=1)
              + jnp.sum(jnp.square(hi), axis=1)
              + jnp.sum(jnp.square(hj), axis=1))
        loss = (-jax.nn.log_sigmoid(x[:, 0]) + wd * l2) * mf[:, 0]

        if update_mode == "dense":
            # u_presorted: the trainer sorts each batch by user on the host
            # (order within a synchronous batch is semantically irrelevant)
            W, opt_w = optimizer.update_dense(W, opt_w, [(u, g_wu)],
                                              rows_sorted=u_presorted)
            H, opt_h = optimizer.update_dense(
                H, opt_h, [(i, g_hi), (j, g_hj)])
        else:
            W, opt_w = optimizer.update_rows(W, opt_w, u, g_wu)
            H, opt_h = optimizer.update_rows(
                H, opt_h, jnp.concatenate([i, j]),
                jnp.concatenate([g_hi, g_hj]))
        return (W, H, opt_w, opt_h, loss_acc + jnp.sum(loss)), None

    init = (W, H, opt_w, opt_h, jnp.zeros((), W.dtype))
    (W, H, opt_w, opt_h, loss), _ = jax.lax.scan(
        step, init, (u_steps, i_steps, jnp.arange(S)))
    return W, H, opt_w, opt_h, loss / jnp.maximum(n_valid, 1).astype(W.dtype)


class BPR(MFTrainerBase, PersistenceMixin):
    """API-compatible rebuild of ``cymf.BPR`` (`bpr.pyx:37-68`)."""

    def __init__(self, num_components: int = 20, learning_rate: float = 0.001,
                 optimizer: str = "adam", weight_decay: float = 0.01,
                 batch_size: int = 1024, update_mode: str = "auto",
                 engine: str = "xla", packed: str = "auto",
                 neg_pool: int = 0):
        """``engine``:

        * "xla" (default) — vectorized synchronous-minibatch epochs
          (``lax.scan``), scales to any table size across the mesh.
        * "pallas" — VMEM-resident per-sample kernel
          (``cymf_tpu.ops.pallas_engine``) processing 8-sample groups — the
          analogue of the reference's 8 Hogwild threads, with the same
          benign intra-group races.  Measured 176 epochs/s on
          ml-100k-shaped data (v5e) vs the reference's 98.46 (README.md:66).
          Requires TPU and tables + optimizer state within the VMEM budget
          (small catalogs, e.g. ml-100k).

        ``neg_pool`` (opt-in sampling variant, packed engine only): draw
        each step's negatives from a shared pool of that many items
        (lane-aligned, e.g. 1024) instead of one independent draw per
        interaction (`bpr.pyx:165-167`).  Per-sample negatives remain
        marginally uniform over the catalog, but a step's samples share
        the pool — a documented semantic trade for replacing the
        negative-side gather/reorder/accumulation passes with
        VMEM-resident MXU ops (``ops/packed_epoch.py::
        packed_bpr_pool_epoch``).  0 (default) = exact per-sample draws.
        """
        super().__init__(num_components)
        self.learning_rate = float(learning_rate)
        self.optimizer = optimizer
        self.weight_decay = float(weight_decay)
        self.batch_size = int(batch_size)
        if update_mode not in ("auto", "dense", "sparse"):
            raise ValueError("update_mode must be auto|dense|sparse")
        self.update_mode = update_mode
        if engine not in ("xla", "pallas"):
            raise ValueError("engine must be 'xla' or 'pallas'")
        self.engine = engine
        if packed not in ("auto", "on", "off"):
            raise ValueError("packed must be auto|on|off")
        self.packed = packed
        if packed == "on" and engine != "xla":
            raise ValueError("packed='on' requires engine='xla'")
        self.neg_pool = int(neg_pool)
        if self.neg_pool and (self.neg_pool < 128 or self.neg_pool % 128
                              or self.neg_pool > 2048):
            raise ValueError("neg_pool must be 0 or a multiple of 128 in "
                             "[128, 2048] (the pool and its one-hot tiles "
                             "must stay VMEM-resident)")
        if self.neg_pool and packed == "off":
            raise ValueError("neg_pool requires the packed engine")
        if self.optimizer not in ("sgd", "adagrad", "adam"):
            raise Exception(f"{self.optimizer} is invalid.")

    def _fused_engine(self, n_samples: int) -> str:
        """Select the single-chip fused engine: ``"packed"`` (K <= 127,
        lane-packed W + Pallas windowed accumulation,
        ``ops/packed_epoch.py``), ``"wide"`` (K >= 128, multi-granule rows
        + the same scatter-free accumulation, ``ops/wide_epoch.py``), or
        ``""`` (the portable XLA batch engine).

        ``packed='auto'`` picks the fused engine on a real TPU backend
        (the kernels run in slow interpret mode elsewhere); on a
        multi-device mesh both engines run their explicit shard_map
        forms (`parallel/shard_step.sharded_packed_bpr_epoch` /
        ``sharded_wide_bpr_epoch`` — the latter round 5, closing
        BASELINE config 5's multi-device d >= 128 path).
        ``packed='on'`` FORCES it on any backend."""
        from ..ops import packed as pk
        kind = "packed" if pk.packable(self.num_components) else "wide"
        if self.packed == "off":
            return ""
        if self.packed == "on":
            if self.engine != "xla":
                raise ValueError(
                    "packed='on' requires engine='xla'")
            return kind
        if self.engine != "xla":
            return ""
        import jax
        if jax.default_backend() == "tpu" and n_samples >= 4096:
            return kind
        return ""

    def fit(self, X, num_epochs: int = 10, num_threads: int = 1,
            valid_evaluator=None, early_stopping: bool = False,
            verbose: bool = True, seed: int = 1234,
            checkpoint_path=None, checkpoint_every: int = 1,
            resume: bool = False):
        """Train; signature parity with `bpr.pyx:68`.

        ``num_threads`` is accepted for compatibility and ignored (SPMD over
        the mesh replaces Hogwild threads).  ``seed`` drives the negative
        sampler, matching the role of the reference's ``UniformGenerator``
        seed (`bpr.pyx:148`).  ``checkpoint_path`` enables periodic
        state checkpoints; ``resume=True`` continues from the checkpoint's
        epoch with tables AND optimizer state restored.
        """
        X = as_csr(X)
        self.valid_evaluator = valid_evaluator
        self.valid_dcg = -np.inf
        self.early_stopping = early_stopping
        if early_stopping and valid_evaluator is None:
            raise ValueError()

        U, I = X.shape
        self._num_users, self._num_items = U, I
        self._ensure_tables(U, I)

        users, positives = sk_utils.shuffle(*(X.nonzero()))
        users = users.astype(np.int32)
        positives = positives.astype(np.int32)
        self._samples_per_epoch = len(users)
        if self.engine == "pallas":
            if checkpoint_path is not None:
                raise NotImplementedError(
                    "checkpointing is only supported with engine='xla'")
            return self._fit_pallas(X, users, positives, num_epochs, verbose,
                                    seed)
        N = len(users)
        mesh = self.mesh
        mesh_n = mesh.num_devices
        fused = self._fused_engine(N)
        B = min(self.batch_size, max(N, mesh_n))
        B = -(-B // 1024) * 1024 if fused else mesh.pad_rows(B)
        S = max(1, -(-N // B))
        pad = S * B - N
        if pad:
            users = np.concatenate(
                [users, np.full(pad, PAD_USER, np.int32)])
            positives = np.concatenate([positives, np.zeros(pad, np.int32)])

        # sort each batch by user: enables indices_are_sorted on the W
        # scatter (~20% cheaper) without changing synchronous semantics
        u2 = users.reshape(S, B)
        i2 = positives.reshape(S, B)
        order = np.argsort(u2, axis=1, kind="stable")
        u2 = np.take_along_axis(u2, order, axis=1)
        i2 = np.take_along_axis(i2, order, axis=1)
        if self.neg_pool and fused != "packed":
            raise ValueError(
                "neg_pool requires the packed engine (K <= 127 and a "
                "single-device TPU run, or packed='on'); this fit "
                f"selected {fused or 'the XLA batch engine'!r}")
        if fused == "packed":
            if mesh_n > 1 and not self.neg_pool:
                return self._fit_packed_sharded(
                    X, u2, i2, num_epochs, verbose, seed,
                    checkpoint_path, checkpoint_every, resume)
            if mesh_n > 1:
                import warnings
                warnings.warn(
                    "neg_pool is a single-chip VMEM structure: the "
                    f"{mesh_n}-device mesh is ignored and the pool "
                    "engine runs on the default device", stacklevel=2)
            return self._fit_packed(X, u2, i2, num_epochs, verbose, seed,
                                    checkpoint_path, checkpoint_every,
                                    resume)
        if fused == "wide":
            if mesh_n > 1:
                return self._fit_wide_sharded(
                    X, u2, i2, num_epochs, verbose, seed,
                    checkpoint_path, checkpoint_every, resume)
            return self._fit_wide(X, u2, i2, num_epochs, verbose, seed,
                                  checkpoint_path, checkpoint_every,
                                  resume)
        u_steps = jax.device_put(u2, mesh.batch2d())
        i_steps = jax.device_put(i2, mesh.batch2d())
        coo = X.tocoo()
        hs = build_pair_hashset(coo.row, coo.col)
        hs = jax.tree_util.tree_map(mesh.put_replicated, hs)

        Wd = self._pad_table(self.W)
        Hd = self._pad_table(self.H)
        if mesh.num_devices > 1 and self.update_mode == "sparse":
            import warnings
            warnings.warn(
                "update_mode='sparse' applies to the single-device path "
                "only; the shard_map epoch uses dense masked updates "
                "(each shard's update buffer is its table shard — "
                "already O(rows/devices) memory)", stacklevel=2)
        if mesh.num_devices > 1:
            # explicit shard_map path: row-sharded tables, sharded batch,
            # hand-placed O(batch) collectives — compute partitioning is
            # guaranteed by construction (parallel/shard_step.py) and the
            # negative stream is bitwise-identical to the 1-device path.
            opt, epoch_jit = _sharded_epoch_jit(
                mesh, self.optimizer, self.learning_rate,
                self.weight_decay, U, I)
        else:
            mode = choose_update_mode(self.update_mode, 3 * B,
                                      Wd.shape[0] + Hd.shape[0])
            opt, epoch_jit = _bpr_epoch_jit(
                self.optimizer, self.learning_rate, self.weight_decay,
                U, I, mode)
        opt_w = opt.init(Wd)
        opt_h = opt.init(Hd)
        base_key = jax.random.PRNGKey(seed)
        self._state = {"W": Wd, "H": Hd, "ow": opt_w, "oh": opt_h}
        self.last_loss = None
        self._last_loss_dev = None

        start_epoch = 0
        if resume and checkpoint_path is not None \
                and __import__("os").path.exists(checkpoint_path):
            from ..ops import packed as pkl
            flat, last_epoch = _load_ckpt_raw(checkpoint_path)
            start_epoch = last_epoch + 1
            st = self._state
            Up, Ip = st["W"].shape[0], st["H"].shape[0]
            K = self.num_components
            s = pkl.num_slots(K)
            # tables: both schemas store logical rows (the packed engine
            # publishes unpacked views), so slice + re-pad covers both
            st["W"] = self._pad_table(np.asarray(flat["W"])[:U])
            st["H"] = self._pad_table(np.asarray(flat["H"])[:I])

            def unpack_w(a):  # packed (rw, 128) -> padded logical (Up, K)
                lg = a[:, :s * K].reshape(-1, K)[:U]
                return np.pad(lg, ((0, Up - U), (0, 0)))

            def unpack_h(a):  # logical-layout (rh, 128) -> (Ip, K)
                return np.pad(a[:I, :K], ((0, Ip - I), (0, 0)))

            def repad_w(a):  # logical (>=U, K) under other padding
                return np.pad(a[:U], ((0, Up - U), (0, 0)))

            def repad_h(a):
                return np.pad(a[:I], ((0, Ip - I), (0, 0)))

            # the WIDE engine's schema (oww/ohw) stores logical rows
            # with lane-padded columns — rewrite into the XLA-native
            # prefix before the packed-vs-logical converter runs
            for pre, n_rows in (("oww", U), ("ohw", I)):
                for k in [k for k in flat if k.startswith(pre + "/")]:
                    sub = k.split("/", 1)[1]
                    dst = ("ow/" if pre == "oww" else "oh/") + sub
                    if dst not in flat:
                        flat[dst] = np.asarray(flat[k])[:n_rows, :K]

            mrow_w = np.arange(Up)[:, None] < U
            mrow_h = np.arange(Ip)[:, None] < I
            st["ow"] = _restore_opt_state(flat, "ow", "owp", st["ow"],
                                          unpack_w, mrow_w, _place_like,
                                          repad=repad_w)
            st["oh"] = _restore_opt_state(flat, "oh", "ohp", st["oh"],
                                          unpack_h, mrow_h, _place_like,
                                          repad=repad_h)

        def epoch_fn(epoch):
            st = self._state
            st["W"], st["H"], st["ow"], st["oh"], self._last_loss_dev = \
                epoch_jit(st["W"], st["H"], st["ow"], st["oh"],
                          u_steps, i_steps, hs,
                          jnp.asarray(N, jnp.int32),
                          jax.random.fold_in(base_key, epoch))

        def snapshot_fn():
            return (self.W, self.H)

        def restore_fn(snap):
            self.W, self.H = np.array(snap[0]), np.array(snap[1])

        self._run_epochs(num_epochs, epoch_fn, snapshot_fn, restore_fn,
                         verbose, checkpoint_path=checkpoint_path,
                         checkpoint_every=checkpoint_every,
                         start_epoch=start_epoch)
        if self._last_loss_dev is not None:
            self.last_loss = float(jax.device_get(self._last_loss_dev))
        self._finalize_fit()

    def _fit_packed(self, X, u2, i2, num_epochs, verbose, seed,
                    checkpoint_path, checkpoint_every, resume):
        """Single-chip fast path: packed tables + Pallas windowed
        accumulation + host-side negative streams (ops/packed_epoch.py).
        Identical update semantics to the XLA batch engine."""
        import jax
        import jax.numpy as jnp

        from ..ops import packed as pk
        from ..ops.packed_epoch import (packed_bpr_epoch, prep_backend,
                                        prep_epoch, prep_static,
                                        unpack_device)
        from ..ops.packed_epoch import make_packed_optimizer

        # which host prep drew the negative streams (native mt19937_64 vs
        # numpy PCG64 — different, equally uniform, deterministic streams;
        # CYMF_TPU_PREP=numpy forces the portable one)
        self.prep_backend_ = prep_backend()
        U, I = X.shape
        K = self.num_components
        S, B = u2.shape
        N = self._samples_per_epoch
        self.last_loss = None
        # W packed (dense optimizer pass stays s-fold smaller), H logical
        # (lane-aligned gathers, no slot rotations) — see ops/fused_sample.
        # 256-row accumulation windows measured ~0.8% faster than 512 on
        # the realistic ML-20M stream (docs/measurements/r4/sweep_W*_b.log)
        wrows_w, wrows_h = 256, 256
        rw = pk.packed_rows(U, K, multiple=wrows_w)
        rh = pk.logical_rows(I, multiple=wrows_h)
        interpret = jax.default_backend() != "tpu"

        if self.neg_pool:
            from ..ops.fused_step import supports_v8
            from ..ops.packed_epoch import prep_static_pool
            if not supports_v8(K, rw, wrows_w, self.neg_pool):
                raise ValueError(
                    f"neg_pool={self.neg_pool} unsupported at "
                    f"num_components={K}: needs s*(K+1) <= 127 and a "
                    "lane-aligned pool")
            winw, si, rowsi, wini = prep_static_pool(
                u2, i2, K, rw, rh, wrows_w, wrows_h)
            wstart = bcs = bcn = np.zeros((u2.shape[0], 1), np.int32)
            kernel_v = 8
            # pool prep DRAWS only from the portable numpy PCG64 stream
            # (the native pool_reject helper accelerates the membership
            # test bit-identically) — record the stream, not the helper
            self.prep_backend_ = "numpy"
        else:
            winw, wstart, si, rowsi, wini, bcs, bcn, kernel_v = \
                prep_static(u2, i2, K, rw, rh, wrows_w, wrows_h)
        # which fused pipeline ran (8/6/5/4 — data-dependent, see
        # ops.packed_epoch.engine_version; 8 = shared-negative pool);
        # for diagnostics/repro
        self.packed_kernel_ = kernel_v
        coo = X.tocoo()
        pos_keys = np.sort(coo.row.astype(np.int64) * I + coo.col)
        # once-per-fit rejection filter (the prep's hot membership test
        # for both the exact and pool engines)
        from ..ops.packed_epoch import make_reject_filter
        self._key_filter = make_reject_filter(pos_keys, U, I)

        Wp = jnp.asarray(pk.pack_array(self.W, K, multiple=wrows_w))
        Hp = jnp.asarray(pk.pack_logical(self.H, K, multiple=wrows_h))
        opt = make_packed_optimizer(self.optimizer, self.learning_rate)
        ow, oh = opt.init(Wp), opt.init(Hp)

        u2d = jnp.asarray(u2)
        i2d = jnp.asarray(i2)
        si_d = jnp.asarray(si)
        rowsi_d = jnp.asarray(rowsi)
        wini_d = jnp.asarray(wini)
        winw_d = jnp.asarray(winw)
        wstart_d = jnp.asarray(wstart)
        bcs_d = jnp.asarray(bcs)
        bcn_d = jnp.asarray(bcn)
        n_valid = jnp.asarray(N, jnp.int32)

        def publish():
            self._state = {"W": unpack_device(Wp, K),
                           "H": Hp[:, :K],
                           "owp": ow, "ohp": oh}

        publish()
        start_epoch = 0
        if resume and checkpoint_path is not None \
                and __import__("os").path.exists(checkpoint_path):
            flat, last_epoch = _load_ckpt_raw(checkpoint_path)
            start_epoch = last_epoch + 1
            Wp, Hp, ow, oh = _packed_resume_state(
                flat, U, I, K, wrows_w, wrows_h, ow, oh,
                jnp.asarray, jnp.asarray)
            publish()

        self._last_loss_dev = None

        # pool mode: the per-sample slot stream is drawn ONCE per fit and
        # lives on device for the whole fit (a fresh uniform pool per
        # epoch makes j = pool_e[r] distributionally identical to
        # redrawing r — see prep_pool_epoch) — per-epoch uploads shrink
        # to the pool ids + a uint8 mask
        r2_fit = rjs_d = None
        if kernel_v == 8:
            rng_r = np.random.default_rng((seed, 1 << 20))
            r2_fit = rng_r.integers(0, self.neg_pool, u2.shape,
                                    dtype=np.int32)
            rjs_d = jnp.asarray(
                r2_fit.reshape(u2.shape[0], u2.shape[1] // 128, 128))

        # CYMF_TPU_BPR_PREP=device (round 5, opt-in): draw/reject/sort
        # the negative side INSIDE the jitted scan — zero per-epoch host
        # work/uploads, at a measured ~1.6-2 ms/step in-scan prep cost
        # (ops/packed_epoch.py::packed_bpr_epoch_device_j).  Default
        # stays host prep: real local hosts overlap it for free and the
        # kernel-rate protocol is unchanged.
        import os
        prep_env = os.environ.get("CYMF_TPU_BPR_PREP", "host")
        if prep_env not in ("host", "device"):
            raise ValueError("CYMF_TPU_BPR_PREP must be host|device")
        if prep_env == "device" and kernel_v == 8:
            raise ValueError(
                "CYMF_TPU_BPR_PREP=device conflicts with neg_pool (the "
                "pool engine's shared draws are host-prepared); unset "
                "one of them")
        device_prep = prep_env == "device"
        if device_prep:
            # the device-j epoch runs the span-unconditional v4 pipeline
            # (v5/v6 fusions need host-computed expansion starts)
            kernel_v = 4
            self.packed_kernel_ = 4
            from ..ops.hashset import build_pair_hashset
            from ..ops.packed_epoch import packed_bpr_epoch_device_j
            hs_dev = jax.tree_util.tree_map(
                jnp.asarray, build_pair_hashset(coo.row, coo.col))
            base_key = jax.random.PRNGKey(seed)
            self.prep_backend_ = "device-threefry"
            S_all = u2.shape[0]
            chunk = 2048
            # static stream slices once per fit; the single-span common
            # case reuses the uploaded arrays outright (device slices
            # are copies — at ML-20M shapes slicing everything would
            # duplicate ~300MB of stream HBM)
            arrays = (u2d, i2d, si_d, rowsi_d, wini_d, winw_d)
            if S_all <= chunk:
                spans = [(0, S_all, arrays)]
            else:
                spans = [(off, min(chunk, S_all - off),
                          tuple(a[off:off + min(chunk, S_all - off)]
                                for a in arrays))
                         for off in range(0, S_all, chunk)]

            def epoch_fn(epoch):
                nonlocal Wp, Hp, ow, oh
                key = jax.random.fold_in(base_key, epoch)
                loss = None
                for off, sc, (us, is_, sis, rws, wis, wws) in spans:
                    Wp, Hp, ow, oh, l = packed_bpr_epoch_device_j(
                        Wp, Hp, ow, oh, us, is_, sis, rws, wis, wws,
                        hs_dev, key,
                        jnp.asarray(off, jnp.int32), n_valid,
                        opt_name=self.optimizer, lr=self.learning_rate,
                        weight_decay=self.weight_decay, K=K, rw=rw,
                        rh=rh, num_users=U, num_items=I,
                        wrows_w=wrows_w, wrows_h=wrows_h,
                        interpret=interpret)
                    loss = l if loss is None else loss + l
                self._last_loss_dev = loss
                publish()

            def snapshot_fn():
                return (self.W, self.H)

            def restore_fn(snap):
                self.W, self.H = np.array(snap[0]), np.array(snap[1])

            self._run_epochs(num_epochs, epoch_fn, snapshot_fn,
                             restore_fn, verbose,
                             checkpoint_path=checkpoint_path,
                             checkpoint_every=checkpoint_every,
                             start_epoch=start_epoch)
            if self._last_loss_dev is not None:
                self.last_loss = float(jax.device_get(
                    self._last_loss_dev))
            self._finalize_fit()
            return

        def epoch_fn(epoch):
            nonlocal Wp, Hp, ow, oh
            if kernel_v == 8:
                from ..ops.packed_epoch import (packed_bpr_pool_epoch,
                                                prep_pool_epoch)
                rng = np.random.default_rng((seed, epoch))
                pool2, _, mask, _ = prep_pool_epoch(
                    rng, u2, pos_keys, U, I, self.neg_pool, r2=r2_fit,
                    key_filter=self._key_filter)
                Wp, Hp, ow, oh, self._last_loss_dev = \
                    packed_bpr_pool_epoch(
                        Wp, Hp, ow, oh, u2d, i2d, si_d, rowsi_d, wini_d,
                        jnp.asarray(pool2), rjs_d,
                        jnp.asarray(mask), winw_d, n_valid,
                        opt_name=self.optimizer, lr=self.learning_rate,
                        weight_decay=self.weight_decay, K=K, rw=rw,
                        rh=rh, wrows_w=wrows_w, wrows_h=wrows_h,
                        interpret=interpret)
                publish()
                return
            # the C++ prep (OpenMP counting-sort pipeline, ~20x numpy) is
            # used when built; both are deterministic per (seed, epoch)
            rng = np.random.default_rng((seed, epoch))
            j2, mask, sj, rowsj, winj = prep_epoch(
                rng, u2, i2, pos_keys, U, I, K, rh, wrows_h,
                native_seed=seed * 1_000_003 + epoch,
                key_filter=self._key_filter)
            Wp, Hp, ow, oh, self._last_loss_dev = packed_bpr_epoch(
                Wp, Hp, ow, oh, u2d, i2d, si_d, rowsi_d, wini_d,
                jnp.asarray(j2), jnp.asarray(mask), jnp.asarray(sj),
                jnp.asarray(rowsj), jnp.asarray(winj), winw_d, wstart_d,
                bcs_d, bcn_d, n_valid,
                opt_name=self.optimizer, lr=self.learning_rate,
                weight_decay=self.weight_decay, K=K, rw=rw, rh=rh,
                wrows_w=wrows_w, wrows_h=wrows_h, interpret=interpret,
                kernel_v=kernel_v)
            publish()

        def snapshot_fn():
            return (self.W, self.H)

        def restore_fn(snap):
            self.W, self.H = np.array(snap[0]), np.array(snap[1])

        self._run_epochs(num_epochs, epoch_fn, snapshot_fn, restore_fn,
                         verbose, checkpoint_path=checkpoint_path,
                         checkpoint_every=checkpoint_every,
                         start_epoch=start_epoch)
        if self._last_loss_dev is not None:
            self.last_loss = float(jax.device_get(self._last_loss_dev))
        self._finalize_fit()

    def _fit_packed_sharded(self, X, u2, i2, num_epochs, verbose, seed,
                            checkpoint_path, checkpoint_every, resume):
        """Multi-device packed engine: row-sharded packed W + replicated
        logical H, shard-contiguous sample slices (the u-sorted stream
        splits into per-shard slices, so every W gather/kernel/optimizer
        stage is fully local), ONE item-table psum per step.  See
        `parallel/shard_step.sharded_packed_bpr_epoch`.  Negative streams
        are drawn GLOBALLY (identical to the 1-device stream) before
        slicing, so fits are mesh-size-invariant up to float summation
        order — the sharded analogue of `bpr.pyx:162-169`'s Hogwild epoch
        with the user-sort replacing the shared address space."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..ops import packed as pk
        from ..ops.packed_epoch import (make_packed_optimizer,
                                        make_reject_filter, prep_backend,
                                        prep_epoch, prep_shard_epoch,
                                        prep_shard_static, unpack_device)
        from ..parallel.mesh import ROW_AXIS

        if self.neg_pool:
            raise ValueError(
                "neg_pool requires a single-device mesh (the shared pool "
                "is a VMEM-resident single-chip structure)")
        mesh = self.mesh
        n = mesh.num_devices
        self.prep_backend_ = prep_backend()
        U, I = X.shape
        K = self.num_components
        N = self._samples_per_epoch
        self.last_loss = None
        wrows_w, wrows_h = 256, 256
        # every shard's local row range must be a whole number of
        # accumulation windows
        rw = pk.packed_rows(U, K, multiple=wrows_w * n)
        rh = pk.logical_rows(I, multiple=wrows_h)
        interpret = jax.default_backend() != "tpu"
        # the sharded engine runs the span-independent v4 pipeline
        self.packed_kernel_ = 4

        (u_loc, i_loc, winw, si, rowsi, wini, starts, counts, Bd) = \
            prep_shard_static(u2, i2, K, rw, rh, wrows_w, wrows_h, n)
        coo = X.tocoo()
        pos_keys = np.sort(coo.row.astype(np.int64) * I + coo.col)
        self._key_filter = make_reject_filter(pos_keys, U, I)

        table_sh = NamedSharding(mesh.mesh, P(ROW_AXIS, None))
        rep_sh = mesh.replicated()
        stream_sh = NamedSharding(mesh.mesh, P(ROW_AXIS))
        put_w = lambda a: jax.device_put(np.asarray(a), table_sh)
        put_h = lambda a: jax.device_put(np.asarray(a), rep_sh)
        put_s = lambda a: jax.device_put(np.asarray(a), stream_sh)

        Wp = put_w(pk.pack_array(self.W, K, multiple=wrows_w * n))
        Hp = put_h(pk.pack_logical(self.H, K, multiple=wrows_h))
        opt = make_packed_optimizer(self.optimizer, self.learning_rate)
        ow, oh = opt.init(Wp), opt.init(Hp)

        u_d, i_d, si_d, rowsi_d, wini_d, winw_d = (
            put_s(a) for a in (u_loc, i_loc, si, rowsi, wini, winw))
        n_valid = jnp.asarray(N, jnp.int32)
        epoch_fn_jit = _sharded_packed_epoch_jit(
            mesh, self.optimizer, self.learning_rate, self.weight_decay,
            K, rw, rh, wrows_w, wrows_h, interpret)

        def publish():
            self._state = {"W": unpack_device(Wp, K),
                           "H": Hp[:, :K],
                           "owp": ow, "ohp": oh}

        publish()
        start_epoch = 0
        if resume and checkpoint_path is not None \
                and __import__("os").path.exists(checkpoint_path):
            flat, last_epoch = _load_ckpt_raw(checkpoint_path)
            start_epoch = last_epoch + 1
            Wp, Hp, ow, oh = _packed_resume_state(
                flat, U, I, K, wrows_w * n, wrows_h, ow, oh, put_w, put_h)
            publish()

        self._last_loss_dev = None

        def epoch_fn(epoch):
            nonlocal Wp, Hp, ow, oh
            # global draws (the 1-device stream), then shard slicing;
            # the global j-side sort is recomputed per shard, so the
            # prep's own sorted side is unused here
            rng = np.random.default_rng((seed, epoch))
            j2, mask, _, _, _ = prep_epoch(
                rng, u2, i2, pos_keys, U, I, K, rh, wrows_h,
                native_seed=seed * 1_000_003 + epoch,
                key_filter=self._key_filter, sides=False)
            j_loc, mf, sj, rowsj, winj = prep_shard_epoch(
                j2, mask, starts, counts, Bd, rh, wrows_h, n)
            Wp, Hp, ow, oh, self._last_loss_dev = epoch_fn_jit(
                Wp, Hp, ow, oh, u_d, i_d, si_d, rowsi_d, wini_d,
                put_s(j_loc), put_s(mf), put_s(sj), put_s(rowsj),
                put_s(winj), winw_d, n_valid)
            publish()

        def snapshot_fn():
            return (self.W, self.H)

        def restore_fn(snap):
            self.W, self.H = np.array(snap[0]), np.array(snap[1])

        self._run_epochs(num_epochs, epoch_fn, snapshot_fn, restore_fn,
                         verbose, checkpoint_path=checkpoint_path,
                         checkpoint_every=checkpoint_every,
                         start_epoch=start_epoch)
        if self._last_loss_dev is not None:
            self.last_loss = float(jax.device_get(self._last_loss_dev))
        self._finalize_fit()

    def _fit_wide_sharded(self, X, u2, i2, num_epochs, verbose, seed,
                          checkpoint_path, checkpoint_every, resume):
        """Multi-device wide engine (round 5 — BASELINE config 5's
        pod-slice fast path for K >= 128): row-sharded wide W with
        shard-contiguous u-sorted sample slices (every W stage local),
        replicated wide H merged by ONE ``(rh, Kp+128)`` psum per step.
        See `parallel/shard_step.sharded_wide_bpr_epoch`.  Negative
        streams are drawn GLOBALLY (the 1-device stream) before slicing,
        so fits are mesh-size-invariant up to float summation order."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..ops.packed_epoch import (make_packed_optimizer,
                                        make_reject_filter, prep_backend,
                                        prep_epoch, prep_shard_epoch)
        from ..ops.wide_epoch import (pack_wide, prep_shard_static_wide,
                                      wide_rows, wide_shard_masks)
        from ..parallel.mesh import ROW_AXIS

        mesh = self.mesh
        n = mesh.num_devices
        self.prep_backend_ = prep_backend()
        U, I = X.shape
        K = self.num_components
        N = self._samples_per_epoch
        self.last_loss = None
        wrows = 512
        # every shard's local row range must be a whole number of windows
        rw = wide_rows(U, wrows * n)
        rh = wide_rows(I, wrows)
        interpret = jax.default_backend() != "tpu"

        (u_loc, rowsu, winw, i_loc, si, rowsi, wini, starts, counts,
         Bd) = prep_shard_static_wide(u2, i2, rw, rh, wrows, n)
        coo = X.tocoo()
        pos_keys = np.sort(coo.row.astype(np.int64) * I + coo.col)
        self._key_filter = make_reject_filter(pos_keys, U, I)

        table_sh = NamedSharding(mesh.mesh, P(ROW_AXIS, None))
        rep_sh = mesh.replicated()
        stream_sh = NamedSharding(mesh.mesh, P(ROW_AXIS))
        put_w = lambda a: jax.device_put(np.asarray(a), table_sh)
        put_h = lambda a: jax.device_put(np.asarray(a), rep_sh)
        put_s = lambda a: jax.device_put(np.asarray(a), stream_sh)

        Wd = put_w(pack_wide(self.W, K, multiple=wrows * n))
        Hd = put_h(pack_wide(self.H, K, multiple=wrows))
        opt = make_packed_optimizer(self.optimizer, self.learning_rate)
        ow, oh = opt.init(Wd), opt.init(Hd)

        u_d, rowsu_d, winw_d, i_d, si_d, rowsi_d, wini_d = (
            put_s(a) for a in (u_loc, rowsu, winw, i_loc, si, rowsi,
                               wini))
        n_valid = jnp.asarray(N, jnp.int32)
        epoch_fn_jit = _sharded_wide_epoch_jit(
            mesh, self.optimizer, self.learning_rate, self.weight_decay,
            K, rw, rh, wrows, interpret)

        def publish():
            self._state = {"W": Wd[:, :K], "H": Hd[:, :K],
                           "oww": ow, "ohw": oh}

        publish()
        start_epoch = 0
        if resume and checkpoint_path is not None \
                and __import__("os").path.exists(checkpoint_path):
            flat, last_epoch = _load_ckpt_raw(checkpoint_path)
            start_epoch = last_epoch + 1
            Wd = put_w(pack_wide(np.asarray(flat["W"])[:U], K,
                                 multiple=wrows * n))
            Hd = put_h(pack_wide(np.asarray(flat["H"])[:I], K,
                                 multiple=wrows))

            def cvt_w(a):  # logical XLA leaf (>=U, K) -> sharded wide
                return pack_wide(a[:U], K, multiple=wrows * n)

            def cvt_h(a):
                return pack_wide(a[:I], K, multiple=wrows)

            mpay_w = pack_wide(np.ones((U, K), np.float32), K,
                               multiple=wrows * n) > 0
            mpay_h = pack_wide(np.ones((I, K), np.float32), K,
                               multiple=wrows) > 0
            ow = _restore_opt_state(flat, "oww", "ow", ow, cvt_w, mpay_w,
                                    lambda a, t: put_w(a), repad=cvt_w)
            oh = _restore_opt_state(flat, "ohw", "oh", oh, cvt_h, mpay_h,
                                    lambda a, t: put_h(a), repad=cvt_h)
            publish()

        self._last_loss_dev = None

        def epoch_fn(epoch):
            nonlocal Wd, Hd, ow, oh
            # global draws (the 1-device stream), then shard slicing
            rng = np.random.default_rng((seed, epoch))
            j2, mask, _, _, _ = prep_epoch(
                rng, u2, i2, pos_keys, U, I, K, rh, wrows,
                native_seed=seed * 1_000_003 + epoch,
                key_filter=self._key_filter, sides=False)
            j_loc, mf, sj, rowsj, winj = prep_shard_epoch(
                j2, mask, starts, counts, Bd, rh, wrows, n)
            mi, mj = wide_shard_masks(mf, si, sj)
            Wd, Hd, ow, oh, self._last_loss_dev = epoch_fn_jit(
                Wd, Hd, ow, oh, u_d, rowsu_d, winw_d, i_d, si_d,
                rowsi_d, wini_d, put_s(j_loc), put_s(mf), put_s(sj),
                put_s(rowsj), put_s(winj), put_s(mi), put_s(mj),
                n_valid)
            publish()

        def snapshot_fn():
            return (self.W, self.H)

        def restore_fn(snap):
            self.W, self.H = np.array(snap[0]), np.array(snap[1])

        self._run_epochs(num_epochs, epoch_fn, snapshot_fn, restore_fn,
                         verbose, checkpoint_path=checkpoint_path,
                         checkpoint_every=checkpoint_every,
                         start_epoch=start_epoch)
        if self._last_loss_dev is not None:
            self.last_loss = float(jax.device_get(self._last_loss_dev))
        self._finalize_fit()

    def _fit_wide(self, X, u2, i2, num_epochs, verbose, seed,
                  checkpoint_path, checkpoint_every, resume):
        """Single-chip fast path for K >= 128: multi-granule rows +
        scatter-free windowed accumulation (ops/wide_epoch.py).  Identical
        update semantics to the XLA batch engine (count-based touched
        masks, same documented edge as the packed engine)."""
        import jax
        import jax.numpy as jnp

        from ..ops.packed_epoch import make_packed_optimizer, prep_backend
        from ..ops.packed_epoch import prep_epoch
        from ..ops.wide_epoch import (kp_width, pack_wide, prep_static_wide,
                                      wide_bpr_epoch, wide_rows,
                                      wide_sorted_masks)

        self.prep_backend_ = prep_backend()
        U, I = X.shape
        K = self.num_components
        S, B = u2.shape
        N = self._samples_per_epoch
        self.last_loss = None
        wrows = 512
        rw = wide_rows(U, wrows)
        rh = wide_rows(I, wrows)
        interpret = jax.default_backend() != "tpu"

        rowsu, winw, si, rowsi, wini = prep_static_wide(u2, i2, rw, rh,
                                                        wrows)
        coo = X.tocoo()
        pos_keys = np.sort(coo.row.astype(np.int64) * I + coo.col)
        # once-per-fit rejection filter (the prep's hot membership test
        # for both the exact and pool engines)
        from ..ops.packed_epoch import make_reject_filter
        self._key_filter = make_reject_filter(pos_keys, U, I)

        Wd = jnp.asarray(pack_wide(self.W, K, multiple=wrows))
        Hd = jnp.asarray(pack_wide(self.H, K, multiple=wrows))
        opt = make_packed_optimizer(self.optimizer, self.learning_rate)
        ow, oh = opt.init(Wd), opt.init(Hd)

        u2d, i2d = jnp.asarray(u2), jnp.asarray(i2)
        rowsu_d, winw_d = jnp.asarray(rowsu), jnp.asarray(winw)
        si_d, rowsi_d, wini_d = (jnp.asarray(si), jnp.asarray(rowsi),
                                 jnp.asarray(wini))
        n_valid = jnp.asarray(N, jnp.int32)

        def publish():
            self._state = {"W": Wd[:, :K], "H": Hd[:, :K],
                           "oww": ow, "ohw": oh}

        publish()
        start_epoch = 0
        if resume and checkpoint_path is not None \
                and __import__("os").path.exists(checkpoint_path):
            flat, last_epoch = _load_ckpt_raw(checkpoint_path)
            start_epoch = last_epoch + 1
            Wd = jnp.asarray(pack_wide(np.asarray(flat["W"])[:U], K,
                                       multiple=wrows))
            Hd = jnp.asarray(pack_wide(np.asarray(flat["H"])[:I], K,
                                       multiple=wrows))

            def cvt_w(a):  # logical XLA leaf (>=U, K) -> wide layout
                return pack_wide(a[:U], K, multiple=wrows)

            def cvt_h(a):
                return pack_wide(a[:I], K, multiple=wrows)

            mpay_w = pack_wide(np.ones((U, K), np.float32), K,
                               multiple=wrows) > 0
            mpay_h = pack_wide(np.ones((I, K), np.float32), K,
                               multiple=wrows) > 0
            place = lambda a, t: jnp.asarray(a)
            ow = _restore_opt_state(flat, "oww", "ow", ow, cvt_w, mpay_w,
                                    place, repad=cvt_w)
            oh = _restore_opt_state(flat, "ohw", "oh", oh, cvt_h, mpay_h,
                                    place, repad=cvt_h)
            publish()

        self._last_loss_dev = None

        def epoch_fn(epoch):
            nonlocal Wd, Hd, ow, oh
            rng = np.random.default_rng((seed, epoch))
            j2, mask, sj, rowsj, winj = prep_epoch(
                rng, u2, i2, pos_keys, U, I, K, rh, wrows,
                native_seed=seed * 1_000_003 + epoch,
                key_filter=self._key_filter)
            mi2, mj2 = wide_sorted_masks(mask, si, sj)
            Wd, Hd, ow, oh, self._last_loss_dev = wide_bpr_epoch(
                Wd, Hd, ow, oh, u2d, i2d, rowsu_d, winw_d, si_d, rowsi_d,
                wini_d, jnp.asarray(j2), jnp.asarray(mask),
                jnp.asarray(sj), jnp.asarray(rowsj), jnp.asarray(winj),
                jnp.asarray(mi2), jnp.asarray(mj2),
                n_valid, opt_name=self.optimizer, lr=self.learning_rate,
                weight_decay=self.weight_decay, K=K, rw=rw, rh=rh,
                wrows=wrows, interpret=interpret)
            publish()

        def snapshot_fn():
            return (self.W, self.H)

        def restore_fn(snap):
            self.W, self.H = np.array(snap[0]), np.array(snap[1])

        self._run_epochs(num_epochs, epoch_fn, snapshot_fn, restore_fn,
                         verbose, checkpoint_path=checkpoint_path,
                         checkpoint_every=checkpoint_every,
                         start_epoch=start_epoch)
        if self._last_loss_dev is not None:
            self.last_loss = float(jax.device_get(self._last_loss_dev))
        self._finalize_fit()

    def _fit_pallas(self, X, users, positives, num_epochs, verbose, seed,
                    chunk: int = 4096, group: int = 8):
        """Sequential per-sample training via the VMEM-resident Pallas
        kernel (see ``cymf_tpu.ops.pallas_engine``)."""
        from ..ops.pallas_engine import (bpr_pallas_epoch, fits_vmem,
                                         generate_epoch_negatives,
                                         pack_table, unpack_table)
        U, I = X.shape
        if not fits_vmem(U + I, self.optimizer):
            raise ValueError(
                "tables + optimizer state exceed the VMEM budget; use "
                "engine='xla' for catalogs of this size")

        N = len(users)
        chunk = min(chunk, max(N, group))
        chunk = max(group, (chunk // group) * group)
        S = max(1, -(-N // chunk))
        pad = S * chunk - N
        u_pad = np.concatenate([users, np.zeros(pad, np.int32)])
        i_pad = np.concatenate([positives, np.zeros(pad, np.int32)])
        in_data = np.concatenate(
            [np.ones(N, np.int32), np.zeros(pad, np.int32)])
        u_steps = jnp.asarray(u_pad.reshape(S, 1, chunk))
        i_steps = jnp.asarray(i_pad.reshape(S, 1, chunk))

        coo = X.tocoo()
        pos_keys = np.sort(coo.row.astype(np.int64) * I + coo.col)
        rng = np.random.default_rng(seed)
        interpret = jax.default_backend() != "tpu"

        # pregenerate every epoch's negatives + rejection masks in one
        # vectorized host pass (fresh draws per epoch, like the reference's
        # per-epoch sampling at bpr.pyx:165)
        j_all, keep_all = generate_epoch_negatives(
            rng, np.tile(u_pad, num_epochs), I, pos_keys)
        j_all = jnp.asarray(j_all.reshape(num_epochs, S, 1, chunk))
        mask_all = jnp.asarray(
            (np.tile(in_data, num_epochs) & keep_all.astype(np.int32))
            .reshape(num_epochs, S, 1, chunk))

        K = self.num_components
        Wp = pack_table(np.asarray(self.W, np.float32), self.optimizer)
        Hp = pack_table(np.asarray(self.H, np.float32), self.optimizer)
        self._state = {"W": unpack_table(Wp, K), "H": unpack_table(Hp, K)}
        self._last_loss_dev = None

        if self.valid_evaluator is None and num_epochs > 1:
            # no per-epoch validation -> fuse the whole fit into ONE kernel
            # invocation: grid covers num_epochs * S steps (one dispatch,
            # no per-epoch launch overhead)
            u_fused = jnp.asarray(
                np.tile(u_pad.reshape(S, 1, chunk), (num_epochs, 1, 1)))
            i_fused = jnp.asarray(
                np.tile(i_pad.reshape(S, 1, chunk), (num_epochs, 1, 1)))
            Wp, Hp, loss = bpr_pallas_epoch(
                Wp, Hp, u_fused, i_fused,
                j_all.reshape(num_epochs * S, 1, chunk),
                mask_all.reshape(num_epochs * S, 1, chunk),
                optimizer=self.optimizer, lr=self.learning_rate,
                wd=self.weight_decay, interpret=interpret, group=group)
            self._state["W"] = unpack_table(Wp, K)
            self._state["H"] = unpack_table(Hp, K)
            self.last_loss = float(jax.device_get(loss)) / max(
                N * num_epochs, 1)
            self._finalize_fit()
            return

        def epoch_fn(epoch):
            nonlocal Wp, Hp
            Wp, Hp, loss = bpr_pallas_epoch(
                Wp, Hp, u_steps, i_steps,
                j_all[epoch % num_epochs],
                mask_all[epoch % num_epochs],
                optimizer=self.optimizer, lr=self.learning_rate,
                wd=self.weight_decay, interpret=interpret, group=group)
            self._state["W"] = unpack_table(Wp, K)
            self._state["H"] = unpack_table(Hp, K)
            self._last_loss_dev = loss / max(N, 1)

        def snapshot_fn():
            return (self.W, self.H)

        def restore_fn(snap):
            self.W, self.H = np.array(snap[0]), np.array(snap[1])

        self._run_epochs(num_epochs, epoch_fn, snapshot_fn, restore_fn,
                         verbose)
        if self._last_loss_dev is not None:
            self.last_loss = float(jax.device_get(self._last_loss_dev))
        self._finalize_fit()
