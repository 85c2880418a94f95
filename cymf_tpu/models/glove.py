"""GloVe (Pennington et al. 2014) — TPU-native trainer.

Behavioural spec from `/root/reference/cymf/glove.pyx` + `model.pyx:145-204`
+ `optimizer.pyx:85-123`: weighted least squares over co-occurrence counts,

    diff = w_c . h_x + b_c + b_x - log(count)
    f    = min((count / x_max)^alpha, 1)
    L    = 0.5 * f * diff^2

trained with AdaGrad (accumulators initialized to ones) over two embedding
tables and two bias vectors; the final embedding is the average
``(W_central + W_context) / 2`` (`glove.pyx:112`).

Bias handling (``bias_mode``): the default "fused" mode carries the biases
as augmented table columns (``[w | b_c | 1] . [h | 1 | b_x]``) so they get
one AdaGrad update per sample — the GloVe paper's rule, and ~2x faster.
The reference has a quirk here: its backward emits the *bias* gradient once
per latent dimension — K sequential AdaGrad bias updates per sample with
the same gradient (`model.pyx:195-204`); ``bias_mode="kfold"`` replicates
that exactly via the closed form ``delta = -lr * g * sum_{t=1..K}
rsqrt(a0 + t*g^2)``, ``accum += K * g^2``.

Fixed reference defect (SURVEY.md §7): the context bias is sized by
``X.shape[1]`` (the reference sizes it with ``X.shape[0]``,
`glove.pyx:94` — identical for the square matrices it is used with).

TPU-native redesign: the Hogwild ``prange`` over co-occurrence triples
(`glove.pyx:151-153`) becomes a jitted ``lax.scan`` over minibatches with
segment-sum dedup and sparse scatter updates, sharded over the mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse
from sklearn import utils as sk_utils
from tqdm import tqdm

from .. import config
from ..ops.segment import dedup_rows
from ..optim import AdaGrad
from ..parallel.mesh import current_mesh


def _bias_kfold_update(bias, accum, rows, grads, lr, k_steps: int,
                       presorted: bool = False):
    """K consecutive AdaGrad steps with a constant gradient, closed form.

    ``bias``/``accum`` are (V, 1) column vectors: 1D (V,) arrays scatter
    along TPU *lanes*, which serializes; the column layout makes these
    row-addressed sublane scatters like the embedding tables (~10 ms/step
    -> ~1 ms/step at B=131k, measured).
    """
    drop = bias.shape[0]
    rows, g = dedup_rows(rows, grads[:, None], drop, presorted=presorted)
    crows = jnp.clip(rows, 0, drop - 1)
    a0 = accum[crows]                                   # (B, 1)
    t = jnp.arange(1, k_steps + 1, dtype=bias.dtype)
    denom = jnp.sqrt(a0 + t[None, :] * jnp.square(g))
    delta = -lr * g[:, :1] * jnp.sum(1.0 / denom, axis=1, keepdims=True)
    accum = accum.at[rows].set(a0 + k_steps * jnp.square(g[:, :1]),
                               mode="drop", unique_indices=True)
    bias = bias.at[rows].add(delta, mode="drop", unique_indices=True)
    return bias, accum


@functools.lru_cache(maxsize=16)
def _sharded_glove_epoch_jit(mesh, lr: float, x_max: float, alpha: float,
                             K: int, num_central: int):
    """Cached jitted shard_map epoch (fused-bias mode) — row-sharded
    augmented tables, sharded co-occurrence batches, O(batch) collectives
    (parallel/shard_step.py::sharded_glove_epoch)."""
    from ..parallel.shard_step import sharded_glove_epoch
    opt = AdaGrad(lr)
    return opt, sharded_glove_epoch(mesh, opt, x_max, alpha, K, num_central)


@functools.lru_cache(maxsize=16)
def _sharded_glove_kfold_epoch_jit(mesh, lr: float, x_max: float,
                                   alpha: float, K: int, num_central: int):
    """Cached jitted shard_map epoch for the reference-exact kfold bias
    mode (parallel/shard_step.py::sharded_glove_kfold_epoch)."""
    from ..parallel.shard_step import sharded_glove_kfold_epoch
    opt = AdaGrad(lr)
    return opt, sharded_glove_kfold_epoch(mesh, opt, x_max, alpha, K,
                                          num_central)


@functools.lru_cache(maxsize=16)
def _sharded_packed_glove_jit(mesh, lr: float, K: int, rw: int, rh: int,
                              wrows_w: int, wrows_h: int, interpret: bool):
    """Cached jitted shard_map PACKED GloVe epoch per (mesh, config) —
    repeated fits must not pay a fresh remote compile."""
    from ..parallel.shard_step import sharded_packed_glove_epoch
    return sharded_packed_glove_epoch(mesh, lr, K, rw, rh, wrows_w,
                                      wrows_h, interpret)


@functools.lru_cache(maxsize=64)
def _glove_epoch_jit(lr: float, x_max: float, alpha: float, K: int,
                     num_central: int, mode: str, bias_mode: str):
    opt = AdaGrad(lr)
    fn = jax.jit(
        functools.partial(_glove_epoch, optimizer=opt, x_max=x_max,
                          alpha=alpha, learning_rate=lr, num_components=K,
                          num_central=num_central, update_mode=mode,
                          bias_mode=bias_mode),
        donate_argnums=tuple(range(8)))
    return opt, fn


def _glove_epoch(Wc, Wx, bc, bx, ow, oh, abc, abx, c_steps, x_steps,
                 n_steps_counts, n_valid, *, optimizer, x_max, alpha,
                 learning_rate, num_components, num_central,
                 update_mode="dense", bias_mode="fused"):
    """``bias_mode``:

    * "fused" (default): biases ride as augmented table columns —
      ``[w | b_c | 1] . [h | 1 | b_x] = w.h + b_c + b_x`` — so the bias
      gradient flows through the same dense AdaGrad update as the
      embeddings (one update per sample, the GloVe paper's rule; the
      constant columns are masked out of the gradient).  ~2x faster.
    * "kfold": separate bias vectors with the reference's quirk replicated
      exactly — K consecutive AdaGrad bias updates per sample
      (`model.pyx:195-204` emits the bias gradient once per latent dim),
      applied in closed form.
    In fused mode Wc/Wx are [V, K+2] augmented tables and bc/bx are unused
    (passed through).
    """
    S, B = c_steps.shape
    lr = learning_rate
    K = num_components

    def step(carry, xs):
        Wc, Wx, bc, bx, ow, oh, abc, abx, loss_acc = carry
        c, x, cnt, sidx = xs
        # padding triples carry an out-of-range central id (sorts last,
        # OOB scatters dropped) - see the sentinel note in models/bpr.py
        in_data = c < num_central
        mf = in_data.astype(Wc.dtype)

        wc, hx = Wc[c], Wx[x]
        f = jnp.minimum(jnp.power(cnt / x_max, alpha), 1.0)
        if bias_mode == "fused":
            diff = jnp.sum(wc * hx, axis=1) - jnp.log(cnt)
        else:
            diff = (jnp.sum(wc * hx, axis=1) + bc[c, 0] + bx[x, 0]
                    - jnp.log(cnt))
        loss = 0.5 * f * jnp.square(diff) * mf
        fd = (f * diff * mf)[:, None]

        g_c = fd * hx
        g_x = fd * wc
        if bias_mode == "fused":
            # the constant-1 columns must stay constant
            width = Wc.shape[1]
            col = jnp.arange(width)
            g_c = g_c * (col != K + 1)
            g_x = g_x * (col != K)
        if update_mode == "dense":
            # batches are host-presorted by central word
            Wc, ow = optimizer.update_dense(Wc, ow, [(c, g_c)],
                                            rows_sorted=True)
            Wx, oh = optimizer.update_dense(Wx, oh, [(x, g_x)])
        else:
            Wc, ow = optimizer.update_rows(Wc, ow, c, g_c)
            Wx, oh = optimizer.update_rows(Wx, oh, x, g_x)
        if bias_mode == "kfold":
            bc, abc = _bias_kfold_update(bc, abc, c, fd[:, 0], lr,
                                         num_components, presorted=True)
            bx, abx = _bias_kfold_update(bx, abx, x, fd[:, 0], lr,
                                         num_components)
        return (Wc, Wx, bc, bx, ow, oh, abc, abx,
                loss_acc + jnp.sum(loss)), None

    init = (Wc, Wx, bc, bx, ow, oh, abc, abx, jnp.zeros((), Wc.dtype))
    (Wc, Wx, bc, bx, ow, oh, abc, abx, loss), _ = jax.lax.scan(
        step, init, (c_steps, x_steps, n_steps_counts, jnp.arange(S)))
    return Wc, Wx, bc, bx, ow, oh, abc, abx, \
        loss / jnp.maximum(n_valid, 1).astype(Wc.dtype)


class GloVe:
    """API-compatible rebuild of ``cymf.GloVe`` (`glove.pyx:46-75`)."""

    def __init__(self, num_components: int = 50, learning_rate: float = 0.01,
                 alpha: float = 0.75, x_max: float = 10.0,
                 batch_size: int = 4096, update_mode: str = "auto",
                 bias_mode: str = "fused", engine: str = "xla",
                 packed: str = "auto"):
        self.num_components = int(num_components)
        self.learning_rate = float(learning_rate)
        self.alpha = float(alpha)
        self.x_max = float(x_max)
        self.batch_size = int(batch_size)
        if update_mode not in ("auto", "dense", "sparse"):
            raise ValueError("update_mode must be auto|dense|sparse")
        self.update_mode = update_mode
        if bias_mode not in ("fused", "kfold"):
            raise ValueError("bias_mode must be fused|kfold")
        self.bias_mode = bias_mode
        if engine not in ("xla", "pallas"):
            raise ValueError("engine must be 'xla' or 'pallas'")
        self.engine = engine
        if packed not in ("auto", "on", "off"):
            raise ValueError("packed must be auto|on|off")
        self.packed = packed
        self.W = None
        self.bias = None

    def _packed_engine(self, n_samples: int) -> bool:
        """Select the packed fused engine (`ops/glove_epoch.py`):
        fused-bias single-device fits with a packable augmented payload.
        ``packed='auto'`` picks it on a real TPU backend;
        ``packed='on'`` forces it on any backend.  On a multi-device
        mesh the engine runs its explicit shard_map form
        (`parallel/shard_step.py::sharded_packed_glove_epoch`) — the
        stream is identical, so fits are mesh-size-invariant up to
        float summation order."""
        from ..ops.glove_epoch import supports_packed_glove
        if self.packed == "off" or self.engine != "xla" \
                or self.bias_mode != "fused" \
                or not supports_packed_glove(self.num_components):
            if self.packed == "on":
                raise ValueError(
                    "packed='on' requires engine='xla', bias_mode='fused' "
                    "and num_components <= 124 (the augmented payload K+2 "
                    "plus two decoration lanes must lane-pack)")
            return False
        mesh = current_mesh()
        if self.packed == "on":
            return True  # multi-device meshes run the sharded form
        return jax.default_backend() == "tpu" and n_samples >= 4096

    def fit(self, X, num_epochs: int, num_threads: int = 1,
            verbose: bool = False, checkpoint_path=None,
            checkpoint_every: int = 1, resume: bool = False):
        """Train on a sparse co-occurrence matrix (`glove.pyx:75-112`).
        ``num_threads`` accepted for API compatibility; ignored.
        ``checkpoint_path`` persists all four tables + AdaGrad accumulators
        per ``checkpoint_every`` epochs; ``resume=True`` continues."""
        if X is None:
            raise ValueError()
        if not sparse.issparse(X):
            raise TypeError("X must be a type of scipy.sparse.*_matrix.")

        K = self.num_components
        V1, V2 = X.shape
        # init per glove.pyx:91-94 (no seed: uses ambient numpy state)
        W_central = np.random.uniform(-0.5, 0.5, (V1, K)) / K
        central_bias = np.random.uniform(-0.5, 0.5, (V1,)) / K
        W_context = np.random.uniform(-0.5, 0.5, (V2, K)) / K
        context_bias = np.random.uniform(-0.5, 0.5, (V2,)) / K

        coo = X.tocoo()
        central, context, counts = sk_utils.shuffle(
            coo.row.astype(np.int32), coo.col.astype(np.int32),
            coo.data.astype(np.float64))

        N = len(central)
        mesh = current_mesh()
        use_packed = self._packed_engine(N)
        if use_packed:
            B = -(-min(self.batch_size, max(N, 1)) // 1024) * 1024
        else:
            B = mesh.pad_rows(min(self.batch_size, max(N, mesh.num_devices)))
        S = max(1, -(-N // B))
        pad = S * B - N
        if pad:
            central = np.concatenate(
                [central, np.full(pad, np.int32(2**31 - 1))])
            context = np.concatenate([context, np.zeros(pad, np.int32)])
            counts = np.concatenate([counts, np.ones(pad)])
        if self.engine == "pallas":
            if checkpoint_path is not None:
                raise NotImplementedError(
                    "checkpointing is only supported with engine='xla'")
            if self.bias_mode != "fused":
                raise NotImplementedError(
                    "engine='pallas' implements bias_mode='fused' only; "
                    "use engine='xla' for bias_mode='kfold'")
            return self._fit_pallas(W_central, central_bias, W_context,
                                    context_bias, central, context, counts,
                                    N, num_epochs, verbose, V1, V2)
        # per-batch sort by central word (sorted-scatter fast path; order
        # within a synchronous batch is semantically irrelevant; padding
        # sentinels sort last and are masked by the in-data check)
        c2 = central.reshape(S, B)
        x2 = context.reshape(S, B)
        n2 = counts.reshape(S, B)
        order = np.argsort(c2, axis=1, kind="stable")
        c2 = np.take_along_axis(c2, order, axis=1)
        x2 = np.take_along_axis(x2, order, axis=1)
        n2 = np.take_along_axis(n2, order, axis=1)
        if use_packed:
            return self._fit_packed_glove(
                c2, x2, n2, W_central, central_bias, W_context,
                context_bias, N, num_epochs, verbose, V1, V2,
                checkpoint_path, checkpoint_every, resume)
        central = c2.reshape(-1)
        context = x2.reshape(-1)
        counts = n2.reshape(-1)

        dtype = config.param_dtype()

        def table(T):
            if T.ndim == 1:
                T = T[:, None]  # column layout: row-addressed bias scatters
            n_pad = mesh.pad_rows(T.shape[0])
            if n_pad != T.shape[0]:
                T = np.concatenate(
                    [T, np.zeros((n_pad - T.shape[0],) + T.shape[1:],
                                 T.dtype)])
            return jax.device_put(jnp.asarray(T, dtype), mesh.table())

        if self.bias_mode == "fused":
            from ..ops.glove_epoch import augment_tables
            Wc_np, Wx_np = augment_tables(W_central, central_bias,
                                          W_context, context_bias)
            Wc, Wx = table(Wc_np), table(Wx_np)
            bc, bx = table(np.zeros(1)), table(np.zeros(1))  # unused
        else:
            Wc, Wx = table(W_central), table(W_context)
            bc, bx = table(central_bias), table(context_bias)
        c_steps = jax.device_put(central.reshape(S, B), mesh.batch2d())
        x_steps = jax.device_put(context.reshape(S, B), mesh.batch2d())
        n_counts = jax.device_put(
            jnp.asarray(counts.reshape(S, B), dtype), mesh.batch2d())

        from .bpr import choose_update_mode
        mode = choose_update_mode(self.update_mode, 2 * B,
                                  Wc.shape[0] + Wx.shape[0])
        if mesh.num_devices > 1 and self.bias_mode == "fused":
            opt, sh_fn = _sharded_glove_epoch_jit(
                mesh, self.learning_rate, self.x_max, self.alpha, K, V1)

            def epoch_jit(Wc, Wx, bc, bx, ow, oh, abc, abx, c_st, x_st,
                          n_st, nv):
                Wc, Wx, ow, oh, loss = sh_fn(Wc, Wx, ow, oh, c_st, x_st,
                                             n_st, nv)
                return Wc, Wx, bc, bx, ow, oh, abc, abx, loss
        elif mesh.num_devices > 1:
            # reference-exact kfold bias rule, explicitly partitioned
            # (parallel/shard_step.py::sharded_glove_kfold_epoch)
            opt, epoch_jit = _sharded_glove_kfold_epoch_jit(
                mesh, self.learning_rate, self.x_max, self.alpha, K, V1)
        else:
            opt, epoch_jit = _glove_epoch_jit(
                self.learning_rate, self.x_max, self.alpha, K, V1, mode,
                self.bias_mode)
        ow, oh = opt.init(Wc), opt.init(Wx)
        abc = jnp.ones_like(bc)  # accumulators init ones (optimizer.pyx:96-99)
        abx = jnp.ones_like(bx)

        state = {"Wc": Wc, "Wx": Wx, "bc": bc, "bx": bx, "ow": ow,
                 "oh": oh, "abc": abc, "abx": abx}
        start_epoch = 0
        if resume and checkpoint_path is not None \
                and __import__("os").path.exists(checkpoint_path):
            from ..utils.checkpoint import load_checkpoint
            state, last_epoch, _ = load_checkpoint(checkpoint_path, state)
            Wc, Wx, bc, bx = state["Wc"], state["Wx"], state["bc"], state["bx"]
            ow, oh, abc, abx = (state["ow"], state["oh"], state["abc"],
                                state["abx"])
            start_epoch = last_epoch + 1

        loss = None
        from ..utils.checkpoint import AsyncCheckpointer
        ckpt = AsyncCheckpointer() if checkpoint_path else None
        with tqdm(total=num_epochs, leave=True, ncols=100,
                  initial=start_epoch, disable=not verbose) as progress:
            for it in range(start_epoch, num_epochs):
                Wc, Wx, bc, bx, ow, oh, abc, abx, loss = epoch_jit(
                    Wc, Wx, bc, bx, ow, oh, abc, abx, c_steps, x_steps,
                    n_counts, jnp.asarray(N, jnp.int32))
                progress.set_description(
                    f"ITER={it + 1:{len(str(num_epochs))}}, "
                    f"LOSS: {float(jax.device_get(loss)):.4f}")
                progress.update(1)
                if ckpt and (it + 1) % checkpoint_every == 0:
                    state = {"Wc": Wc, "Wx": Wx, "bc": bc, "bx": bx,
                             "ow": ow, "oh": oh, "abc": abc, "abx": abx}
                    ckpt.save(checkpoint_path, state, it)
        if ckpt:
            ckpt.wait()

        self.last_loss = float(jax.device_get(loss)) if loss is not None \
            else None
        if self.bias_mode == "fused":
            self.W_central = np.asarray(Wc[:V1, :K], np.float64)
            self.W_context = np.asarray(Wx[:V2, :K], np.float64)
            self.bias = np.asarray(Wc[:V1, K], np.float64)
            self.context_bias = np.asarray(Wx[:V2, K + 1], np.float64)
        else:
            self.W_central = np.asarray(Wc[:V1], np.float64)
            self.W_context = np.asarray(Wx[:V2], np.float64)
            self.bias = np.asarray(bc[:V1, 0], np.float64)
            self.context_bias = np.asarray(bx[:V2, 0], np.float64)
        self.W = (self.W_central + self.W_context) / 2.0  # glove.pyx:112

    def _fit_packed_glove(self, c2, x2, n2, W_central, central_bias,
                          W_context, context_bias, N, num_epochs, verbose,
                          V1, V2, checkpoint_path=None, checkpoint_every=1,
                          resume=False):
        """Packed fused engine (`ops/glove_epoch.py`): lane-packed
        augmented central table, logical augmented context table, the
        fused sample kernel and scatter-free windowed MXU accumulation —
        the BPR fast path applied to GloVe.  All streams are static per
        fit (no negative sampling), so epochs replay one jitted scan with
        zero per-epoch host work.  Fused-bias AdaGrad semantics identical
        to the XLA epoch (`_glove_epoch`)."""
        from ..ops import packed as pk
        from ..ops.glove_epoch import (packed_glove_epoch,
                                       prep_glove_shard_static,
                                       prep_glove_static)

        mesh = current_mesh()
        n = mesh.num_devices
        K = self.num_components
        Kp = K + 2
        wrows_w, wrows_h = 256, 256
        # sharded: every shard's row range is a whole number of windows
        rw = pk.packed_rows(V1, Kp, multiple=wrows_w * n)
        rh = pk.logical_rows(V2, multiple=wrows_h)
        interpret = jax.default_backend() != "tpu"

        if n > 1:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import ROW_AXIS
            table_sh = NamedSharding(mesh.mesh, P(ROW_AXIS, None))
            stream_sh = NamedSharding(mesh.mesh, P(ROW_AXIS))
            put_w = lambda a: jax.device_put(np.asarray(a), table_sh)
            put_h = lambda a: jax.device_put(np.asarray(a),
                                             mesh.replicated())
            (c_l, x_l, m_l, f_l, l_l, winw_l, sx_l, rowsx_l,
             winx_l, _) = prep_glove_shard_static(
                c2, x2, n2, V1, K, rw, rh, wrows_w, wrows_h, n,
                self.x_max, self.alpha)
            dev = [jax.device_put(np.asarray(a), stream_sh) for a in
                   (c_l, x_l, m_l, f_l, l_l, sx_l, rowsx_l, winx_l,
                    winw_l)]
            epoch_fn = _sharded_packed_glove_jit(
                mesh, self.learning_rate, K, rw, rh, wrows_w, wrows_h,
                interpret)
        else:
            put_w = put_h = jnp.asarray
            m2, f2, l2, winw, sx, rowsx, winx = prep_glove_static(
                c2, x2, n2, V1, K, rw, rh, wrows_w, wrows_h, self.x_max,
                self.alpha)
            dev = [jnp.asarray(a) for a in
                   (c2, x2, m2, f2, l2, sx, rowsx, winx, winw)]

            def epoch_fn(Zc, Zx, oc, ox, *args):
                return packed_glove_epoch(
                    Zc, Zx, oc, ox, *args, lr=self.learning_rate, K=K,
                    rw=rw, rh=rh, wrows_w=wrows_w, wrows_h=wrows_h,
                    interpret=interpret)

        from ..ops.glove_epoch import augment_tables
        Zc_np, Zx_np = augment_tables(W_central, central_bias,
                                      W_context, context_bias)
        Zc = put_w(pk.pack_array(Zc_np.astype(np.float32), Kp,
                                 multiple=wrows_w * n))
        Zx = put_h(pk.pack_logical(Zx_np.astype(np.float32), Kp,
                                   multiple=wrows_h))
        from ..ops.packed_epoch import PackedAdaGrad
        opt = PackedAdaGrad(self.learning_rate)
        oc, ox = opt.init(Zc), opt.init(Zx)
        n_valid = jnp.asarray(N, jnp.int32)

        def fused_state():
            # the XLA fused engine's checkpoint schema at single-device
            # (= logical) shapes — cross-engine resume works both ways.
            # bc/bx/abc/abx are the fused mode's unused placeholders.
            return {"Wc": pk.unpack_array(np.asarray(Zc), V1, Kp),
                    "Wx": np.asarray(Zx)[:V2, :Kp],
                    "bc": np.zeros((1, 1), np.float32),
                    "bx": np.zeros((1, 1), np.float32),
                    "ow": {"accum": pk.unpack_array(
                        np.asarray(oc["accum"]), V1, Kp)},
                    "oh": {"accum": np.asarray(ox["accum"])[:V2, :Kp]},
                    "abc": np.ones((1, 1), np.float32),
                    "abx": np.ones((1, 1), np.float32)}

        start_epoch = 0
        if resume and checkpoint_path is not None                 and __import__("os").path.exists(checkpoint_path):
            from ..utils.checkpoint import load_checkpoint
            st, last_epoch, _ = load_checkpoint(checkpoint_path,
                                                fused_state())
            start_epoch = last_epoch + 1

            def repack_w(a):  # logical (V1, Kp) -> packed, ones filler
                p = pk.pack_array(np.asarray(a), Kp,
                                  multiple=wrows_w * n)
                return np.where(pk.pack_array(
                    np.ones((V1, Kp), np.float32), Kp,
                    multiple=wrows_w * n) > 0, p, 1.0)

            def repack_h(a):  # logical (V2, Kp) -> (rh, 128), ones filler
                p = pk.pack_logical(np.asarray(a), Kp, multiple=wrows_h)
                return np.where(pk.pack_logical(
                    np.ones((V2, Kp), np.float32), Kp,
                    multiple=wrows_h) > 0, p, 1.0)

            Zc = put_w(pk.pack_array(
                np.asarray(st["Wc"]).astype(np.float32), Kp,
                multiple=wrows_w * n))
            Zx = put_h(pk.pack_logical(
                np.asarray(st["Wx"]).astype(np.float32), Kp,
                multiple=wrows_h))
            # off-payload accumulator positions must be ONES (the
            # initializer): a zero accum with zero gradient is
            # 0 * rsqrt(0) = NaN on lanes the kernels never read but
            # the tables would still carry
            oc = {"accum": put_w(repack_w(st["ow"]["accum"]))}
            ox = {"accum": put_h(repack_h(st["oh"]["accum"]))}

        from ..utils.checkpoint import AsyncCheckpointer
        ckpt = AsyncCheckpointer() if checkpoint_path else None

        loss = None
        with tqdm(total=num_epochs, leave=True, ncols=100,
                  initial=start_epoch, disable=not verbose) as progress:
            for it in range(start_epoch, num_epochs):
                Zc, Zx, oc, ox, loss = epoch_fn(
                    Zc, Zx, oc, ox, *dev, n_valid)
                progress.set_description(
                    f"ITER={it + 1:{len(str(num_epochs))}}, "
                    f"LOSS: {float(jax.device_get(loss)):.4f}")
                progress.update(1)
                if ckpt and (it + 1) % checkpoint_every == 0:
                    ckpt.save(checkpoint_path, fused_state(), it)
        if ckpt:
            ckpt.wait()

        self.last_loss = float(jax.device_get(loss)) if loss is not None \
            else None
        Zc_log = pk.unpack_array(np.asarray(Zc), V1, Kp)
        Zx_log = np.asarray(Zx)[:V2, :Kp]
        self.W_central = Zc_log[:, :K].astype(np.float64)
        self.bias = Zc_log[:, K].astype(np.float64)
        self.W_context = Zx_log[:, :K].astype(np.float64)
        self.context_bias = Zx_log[:, K + 1].astype(np.float64)
        self.W = (self.W_central + self.W_context) / 2.0  # glove.pyx:112

    def save_word2vec_format(self, path, index2word):
        """gensim-compatible word2vec text export (`glove.pyx:164-177`)."""
        from pathlib import Path
        output = Path(path)
        with output.open("w") as f:
            f.write(f"{self.W.shape[0]} {self.W.shape[1]}\n")
            for i in range(self.W.shape[0]):
                f.write(f"{index2word[i]} "
                        + " ".join(map(str, self.W[i])) + "\n")

    def _fit_pallas(self, W_central, central_bias, W_context, context_bias,
                    central, context, counts, N, num_epochs, verbose,
                    V1, V2, chunk: int = 4096, group: int = 8):
        """Sequential per-triple training via the VMEM-resident Pallas
        kernel (`cymf_tpu.ops.pallas_engine.glove_pallas_epoch`);
        fused-bias AdaGrad only."""
        from ..ops.pallas_engine import (fits_vmem, glove_pallas_epoch,
                                        pack_table, unpack_table)
        K = self.num_components
        if K + 2 > 126 or not fits_vmem(V1 + V2, "adagrad"):
            raise ValueError(
                "vocab/table size exceeds the VMEM budget; use "
                "engine='xla'")

        Np = len(central)  # already padded to S*B by fit; re-chunk
        chunk = max(group, (min(chunk, Np) // group) * group)
        S = max(1, -(-Np // chunk))
        pad2 = S * chunk - Np
        sent = np.int32(2**31 - 1)
        central = np.concatenate([central, np.full(pad2, sent)])
        context = np.concatenate([context, np.zeros(pad2, np.int32)])
        counts = np.concatenate([counts, np.ones(pad2)])
        keep = (central != sent) & (central < V1) \
            | np.zeros(len(central), bool)
        # original fit() padding used the sentinel too; mask on it
        keep &= np.arange(len(central)) < min(N, len(central))

        f = np.minimum((counts / self.x_max) ** self.alpha, 1.0)
        logcnt = np.log(np.maximum(counts, 1e-30))

        from ..ops.glove_epoch import augment_tables
        Wc_aug, Wx_aug = augment_tables(W_central, central_bias,
                                        W_context, context_bias)
        Wp = pack_table(Wc_aug.astype(np.float32), "adagrad")
        Xp = pack_table(Wx_aug.astype(np.float32), "adagrad")

        import jax
        interpret = jax.default_backend() != "tpu"
        sh = (S, 1, chunk)
        c_d = jnp.asarray(np.where(keep, central, 0).astype(np.int32)
                          .reshape(sh))
        x_d = jnp.asarray(context.astype(np.int32).reshape(sh))
        f_d = jnp.asarray(f.astype(np.float32).reshape(sh))
        lc_d = jnp.asarray(logcnt.astype(np.float32).reshape(sh))
        m_d = jnp.asarray(keep.astype(np.int32).reshape(sh))

        loss = None
        with tqdm(total=num_epochs, leave=True, ncols=100,
                  disable=not verbose) as progress:
            for it in range(num_epochs):
                Wp, Xp, loss = glove_pallas_epoch(
                    Wp, Xp, c_d, x_d, f_d, lc_d, m_d,
                    lr=self.learning_rate, k_dim=K, interpret=interpret,
                    group=group)
                progress.set_description(
                    f"ITER={it + 1:{len(str(num_epochs))}}, "
                    f"LOSS: {float(jax.device_get(loss)):.4f}")
                progress.update(1)

        self.last_loss = float(jax.device_get(loss)) if loss is not None \
            else None
        self.W_central = np.asarray(Wp[:V1, :K], np.float64)
        self.W_context = np.asarray(Xp[:V2, :K], np.float64)
        self.bias = np.asarray(Wp[:V1, K], np.float64)
        self.context_bias = np.asarray(Xp[:V2, K + 1], np.float64)
        self.W = (self.W_central + self.W_context) / 2.0
