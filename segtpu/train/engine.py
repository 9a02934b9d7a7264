"""The jit-compiled training engine.

TPU-first redesign of the reference's per-batch Python loop
(train.py:17-112): an entire epoch is ONE device program — a ``lax.scan``
over the stacked batch array — so there is no per-batch dispatch, no
host↔device metric sync (the reference calls ``.item()`` five times per
batch, train.py:52-60), and XLA can overlap weight update and next-batch
compute. Metrics accumulate on device and are fetched once per epoch.

Per-batch semantics match the reference exactly: metrics are computed per
batch from train-mode outputs and averaged sample-weighted (train.py:56-67);
evaluation uses running BN statistics (model.eval(), train.py:85-106).

Engines are cached per (model-config, loss, weight-decay is injected) so CV
folds and experiment sweeps reuse compiled programs: a new fold with the
same shapes costs zero recompilation (SURVEY.md §2.1 #15).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from segtpu.core.caching import LRUCache
from segtpu.losses import get_loss_function
from segtpu.metrics import calculate_metrics
from segtpu.models.unet import UNetWithBackbone, create_model_state
from segtpu.train.optim import make_optimizer, set_learning_rate

METRIC_KEYS = ("precision", "recall", "f1", "iou", "accuracy", "loss")


def tree_bytes(*trees) -> int:
    """Total byte size of the arrays in the given pytrees. Works on real
    arrays and on shape-only stand-ins (``jax.ShapeDtypeStruct``) — only
    ``.shape``/``.dtype`` are touched, so no device is needed."""
    import numpy as np
    total = 0
    for t in trees:
        for leaf in jax.tree_util.tree_leaves(t):
            total += int(np.prod(leaf.shape)) * jnp.dtype(leaf.dtype).itemsize
    return total


def auto_pipeline_window(config: Dict, per_epoch_bytes: int,
                         cap: int = 4) -> int:
    """HBM-aware epoch-pipelining window (ADVICE r3, medium).

    Each in-flight pipelined epoch pins ``per_epoch_bytes`` of HBM until
    its program runs: a params+batch_stats snapshot plus the queued
    program's shuffled dataset view. A fixed window of 4 silently OOMs at
    HBM-tight scales (512² flagship training sits at the batch ceiling
    already), so unless the caller sets ``pipeline_epochs`` explicitly the
    window is sized to a budget (``pipeline_hbm_budget`` config key,
    default 4 GB — a quarter of a v5e's 16 GB, leaving the live training
    footprint untouched) and capped at ``cap``. Always >= 1 (pipelining
    off is just window 1 — the plain per-epoch loop)."""
    explicit = config.get("pipeline_epochs")
    if explicit is not None:
        return max(1, int(explicit))
    budget = float(config.get("pipeline_hbm_budget", 4e9))
    return max(1, min(cap, int(budget // max(per_epoch_bytes, 1))))


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


class TrainEngine:
    """Holds the jitted epoch/step programs for one (model, loss) pair."""

    def __init__(self, model: UNetWithBackbone, loss_fn: Callable,
                 weight_decay_default: float = 0.0,
                 multiclass: bool = False, remat: str = "none",
                 optimizer: str = "adam",
                 optimizer_kwargs: Optional[Dict] = None):
        self.model = model
        self.loss_fn = loss_fn
        self.multiclass = multiclass
        # "full": jax.checkpoint the whole forward in the train step — the
        # backward recomputes activations instead of reading them from HBM.
        # Measured roofline (tools/train_bench.py): the 512² train step is
        # HBM-bound at ~97% bandwidth / 21% MFU (41-58 FLOP/B vs the v5e's
        # ~240 FLOP/B balance), so trading spare MXU FLOPs for bytes is the
        # right direction. Numerics match to fp-tightness (XLA may fuse
        # the recomputed forward with different FMA contraction).
        self.remat = remat
        if multiclass:
            from segtpu.losses.multiclass import calculate_metrics_multiclass
            self._act = lambda lg: jax.nn.softmax(lg, axis=-1)
            self._metrics = calculate_metrics_multiclass
        else:
            self._act = jax.nn.sigmoid
            self._metrics = calculate_metrics
        self.tx = make_optimizer(optimizer, learning_rate=1e-3,
                                 weight_decay=weight_decay_default,
                                 **(optimizer_kwargs or {}))

        # NOTE: no buffer donation — the training loop snapshots best
        # params by reference (train.py:207-210 analog) and callers may
        # reuse a state pytree; donation would delete those buffers.
        self._train_step = jax.jit(self._train_step_impl)
        self._train_step_accum = jax.jit(self._train_step_accum_impl)
        self._eval_step = jax.jit(self._eval_step_impl)
        self._train_epoch = jax.jit(self._train_epoch_impl)
        self._eval_epoch = jax.jit(self._eval_epoch_impl)

    # ------------------------------------------------------------ init

    def init_state(self, rng: jax.Array, input_shape, learning_rate: float,
                   weight_decay: float) -> TrainState:
        """Fresh (params, batch_stats, opt_state) as ONE cached jitted
        program per input shape. The naive formulation (model.init under a
        throwaway jit + eager optax init) re-traced the whole U-Net and
        issued hundreds of tiny zeros_like dispatches on EVERY call —
        measured 2.7 s per init on the 1-core relay host, i.e. ~14 s of
        pure overhead per 5-fold CV before the first epoch ran."""
        cache = getattr(self, "_init_state_cache", None)
        if cache is None:
            cache = self._init_state_cache = LRUCache(8)
        key = tuple(input_shape)
        fn = cache.get(key)
        if fn is None:
            def _init(rng, lr, wd):
                variables = self.model.init(
                    rng, jnp.zeros(input_shape, self.model.dtype),
                    train=False)
                opt_state = self.tx.init(variables["params"])
                opt_state.hyperparams["learning_rate"] = lr
                opt_state.hyperparams["weight_decay"] = wd
                return TrainState(params=variables["params"],
                                  batch_stats=variables.get(
                                      "batch_stats", {}),
                                  opt_state=opt_state)

            fn = cache[key] = jax.jit(_init)
        return fn(rng, jnp.asarray(learning_rate, jnp.float32),
                  jnp.asarray(weight_decay, jnp.float32))

    def state_from(self, params, batch_stats, learning_rate: float,
                   weight_decay: float) -> TrainState:
        """TrainState around EXISTING params/batch_stats (converted or
        pretrained weights) with a fresh optimizer at the requested
        hyperparams — the reference's train-whatever-the-model-carries
        behavior (train.py:301-364)."""
        opt_state = self.tx.init(params)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            learning_rate, jnp.float32)
        opt_state.hyperparams["weight_decay"] = jnp.asarray(
            weight_decay, jnp.float32)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state)

    # ------------------------------------------------------------ steps

    def _forward_train(self, params, batch_stats, images):
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"])

    def _train_step_impl(self, state: TrainState, images, masks):
        def loss_f(params):
            logits, mut = self._forward_train(params, state.batch_stats, images)
            return self.loss_fn(logits, masks), (logits, mut["batch_stats"])

        if self.remat == "full":
            loss_f = jax.checkpoint(loss_f)
        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_f, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = self._metrics(self._act(logits), masks)
        metrics["loss"] = loss
        return TrainState(new_params, new_bs, new_opt), metrics

    def _train_step_accum_impl(self, state: TrainState, images, masks):
        """Gradient-accumulation step: images/masks (A, b, S, S, 1) — A
        micro-batches folded into ONE optimizer update, for effective
        batches larger than HBM allows in a single forward (A·b total).

        Semantics: per-micro-batch BN statistics (train-mode BN normalizes
        by the micro-batch, as torch would at batch b), running stats
        updated sequentially across micro-batches, gradients averaged over
        A. With identical micro-batches this matches a plain
        ``_train_step`` up to f32 rounding (pinned in
        tests/test_grad_accum.py)."""

        def micro(carry, batch):
            bs_stats, grad_sum, metr_sum = carry
            imgs, msks = batch

            def loss_f(params):
                logits, mut = self.model.apply(
                    {"params": params, "batch_stats": bs_stats}, imgs,
                    train=True, mutable=["batch_stats"])
                return self.loss_fn(logits, msks), (logits,
                                                    mut["batch_stats"])

            if self.remat == "full":
                loss_f = jax.checkpoint(loss_f)
            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_f, has_aux=True)(state.params)
            m = self._metrics(self._act(logits), msks)
            m["loss"] = loss
            mv = jnp.stack([m[k] for k in METRIC_KEYS])
            return (new_bs, jax.tree.map(jnp.add, grad_sum, grads),
                    metr_sum + mv), None

        a = images.shape[0]
        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (new_bs, gsum, msum), _ = jax.lax.scan(
            micro, (state.batch_stats, zeros, jnp.zeros(len(METRIC_KEYS))),
            (images, masks))
        grads = jax.tree.map(lambda g: g / a, gsum)
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(zip(METRIC_KEYS, msum / a))
        return TrainState(new_params, new_bs, new_opt), metrics

    def _eval_step_impl(self, state: TrainState, images, masks):
        logits = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        loss = self.loss_fn(logits, masks)
        metrics = self._metrics(self._act(logits), masks)
        metrics["loss"] = loss
        return metrics

    def _train_epoch_impl(self, state: TrainState, images, masks, valid):
        """images/masks: (n_batches, B, S, S, 1), valid: (n_batches,) bool —
        scan the whole epoch. Invalid (bucketing-pad) batches are skipped
        via lax.cond (no compute, no state change, zero metrics)."""

        def body(st, batch):
            imgs, msks, ok = batch

            def do(st):
                st, m = self._train_step_impl(st, imgs, msks)
                return st, jnp.stack([m[k] for k in METRIC_KEYS])

            def skip(st):
                return st, jnp.zeros((len(METRIC_KEYS),))

            return jax.lax.cond(ok, do, skip, st)

        state, ms = jax.lax.scan(body, state, (images, masks, valid))
        return state, ms  # (n_batches, len(METRIC_KEYS))

    def _eval_epoch_impl(self, state: TrainState, images, masks, valid):
        def body(_, batch):
            imgs, msks, ok = batch

            def do(_):
                m = self._eval_step_impl(state, imgs, msks)
                return jnp.stack([m[k] for k in METRIC_KEYS])

            return None, jax.lax.cond(
                ok, do, lambda _: jnp.zeros((len(METRIC_KEYS),)), None)

        _, ms = jax.lax.scan(body, None, (images, masks, valid))
        return ms

    # ------------------------------------------------------------ epochs

    @staticmethod
    def _bucket(nb: int) -> int:
        """Round a scan length up to a coarse bucket so nearby dataset
        sizes (CV folds, augmentation amounts) share ONE compiled epoch
        program — scan length is a static shape, and each distinct length
        would otherwise recompile (minutes via remote compile)."""
        if nb <= 8:
            return nb
        g = 1 << max(3, nb.bit_length() - 3)
        return -(-nb // g) * g

    @classmethod
    def _pad_batches(cls, fi, fm):
        nb = fi.shape[0]
        target = cls._bucket(nb)
        import numpy as np
        valid = jnp.asarray(np.arange(target) < nb)
        if target > nb:
            pad = target - nb
            fi = jnp.concatenate(
                [fi, jnp.zeros((pad, *fi.shape[1:]), fi.dtype)])
            fm = jnp.concatenate(
                [fm, jnp.zeros((pad, *fm.shape[1:]), fm.dtype)])
        return fi, fm, valid

    def run_train_epoch(self, state: TrainState, loader, lr: float,
                        key: Optional[jax.Array] = None
                        ) -> Tuple[TrainState, Dict[str, float]]:
        """One full training epoch (reference contract: train.py:17-68).

        Returns sample-weighted epoch metrics as floats."""
        set_learning_rate(state.opt_state, lr)
        (fi, fm), rem = loader.batches(key)
        n = loader.n
        b = loader.batch_size
        totals = jnp.zeros(len(METRIC_KEYS))
        if fi.shape[0] > 0:
            fi, fm, valid = self._pad_batches(fi, fm)
            state, ms = self._train_epoch(state, fi, fm, valid)
            totals = totals + jnp.sum(ms, axis=0) * b
        if rem is not None:
            state, m = self._train_step(state, rem[0], rem[1])
            r = rem[0].shape[0]
            totals = totals + jnp.stack([m[k] for k in METRIC_KEYS]) * r
        vals = jax.device_get(totals) / n
        return state, dict(zip(METRIC_KEYS, map(float, vals)))

    def train_step_accum(self, state: TrainState, images, masks,
                         lr: Optional[float] = None):
        """Public gradient-accumulation step for effective batches larger
        than HBM: images/masks (A, b, S, S, 1) — A sequential micro-batch
        grads averaged into one optimizer update (see
        ``_train_step_accum_impl`` for the BN semantics)."""
        if lr is not None:
            set_learning_rate(state.opt_state, lr)
        return self._train_step_accum(state, images, masks)

    def _eval_totals(self, state: TrainState, loader) -> jnp.ndarray:
        """Device-side sample-weighted metric totals for one eval pass."""
        (fi, fm), rem = loader.batches()
        b = loader.batch_size
        totals = jnp.zeros(len(METRIC_KEYS))
        if fi.shape[0] > 0:
            fi, fm, valid = self._pad_batches(fi, fm)
            ms = self._eval_epoch(state, fi, fm, valid)
            totals = totals + jnp.sum(ms, axis=0) * b
        if rem is not None:
            m = self._eval_step(state, rem[0], rem[1])
            r = rem[0].shape[0]
            totals = totals + jnp.stack([m[k] for k in METRIC_KEYS]) * r
        return totals

    def run_eval_epoch(self, state: TrainState, loader) -> Dict[str, float]:
        """Evaluation epoch (reference contract: train.py:71-112)."""
        vals = jax.device_get(self._eval_totals(state, loader)) / loader.n
        return dict(zip(METRIC_KEYS, map(float, vals)))

    # ------------------------------------------------------ fold-parallel

    def _fold_epoch_fn(self, n: int, nv: int, b: int,
                       vmapped: bool = True):
        """Build (and cache) the jitted one-epoch program for train size
        ``n`` / val size ``nv`` / batch ``b``.

        One fold's epoch — shuffle, scan-train, remainder step, eval pass —
        exactly mirrors ``run_train_and_eval_epoch``'s device work but
        returns unfetched metric totals. With ``vmapped`` a leading fold
        axis lifts K independent trainings into ONE dispatch (per-fold
        weights make every conv a grouped conv — measured SLOWER on one
        chip, PERF.md round 3; useful only mesh-sharded). Without, the
        plain single-fold program is returned, for async round-robin
        dispatch across folds (the single-chip winner: identical programs,
        one batched fetch per epoch). The bucketing-pad ``valid`` flags
        are trace-time constants shared by every fold (equal fold sizes
        are a precondition), so the scan's ``lax.cond`` stays a real
        branch under vmap instead of select-both-sides."""
        cache = getattr(self, "_fold_epoch_cache", None)
        if cache is None:
            cache = self._fold_epoch_cache = LRUCache(8)
        key = (n, nv, b, vmapped)
        if key in cache:
            return cache[key]
        nf, r = divmod(n, b)
        nfv, rv = divmod(nv, b)

        def one_fold(state, ti, tm, vi, vm, key):
            perm = jax.random.permutation(key, n)
            ti = jnp.take(ti, perm, axis=0)
            tm = jnp.take(tm, perm, axis=0)
            totals = jnp.zeros(len(METRIC_KEYS))
            if nf:
                fi = ti[: nf * b].reshape(nf, b, *ti.shape[1:])
                fm = tm[: nf * b].reshape(nf, b, *tm.shape[1:])
                fi, fm, valid = self._pad_batches(fi, fm)
                state, ms = self._train_epoch_impl(state, fi, fm, valid)
                totals = totals + jnp.sum(ms, axis=0) * b
            if r:
                state, m = self._train_step_impl(state, ti[nf * b:],
                                                 tm[nf * b:])
                totals = totals + jnp.stack(
                    [m[k] for k in METRIC_KEYS]) * r
            vtot = jnp.zeros(len(METRIC_KEYS))
            if nfv:
                fi = vi[: nfv * b].reshape(nfv, b, *vi.shape[1:])
                fm = vm[: nfv * b].reshape(nfv, b, *vm.shape[1:])
                fi, fm, valid = self._pad_batches(fi, fm)
                ms = self._eval_epoch_impl(state, fi, fm, valid)
                vtot = vtot + jnp.sum(ms, axis=0) * b
            if rv:
                m = self._eval_step_impl(state, vi[nfv * b:], vm[nfv * b:])
                vtot = vtot + jnp.stack([m[k] for k in METRIC_KEYS]) * rv
            return state, totals, vtot

        cache[key] = jax.jit(jax.vmap(one_fold) if vmapped else one_fold)
        return cache[key]

    def run_fold_epochs(self, states: TrainState, tr_i, tr_m, va_i, va_m,
                        lrs, keys, batch_size: int):
        """Advance K stacked independent trainings by one epoch each, in one
        vmapped device program (SURVEY §2.1 #15: CV folds are
        embarrassingly parallel — the reference trains them sequentially,
        cross_validation.py:77-124).

        ``states``: TrainState with a leading fold axis K on every leaf;
        ``tr_i/tr_m`` (K, N, S, S, 1); ``va_i/va_m`` (K, Nv, S, S, 1);
        ``lrs`` (K,) float; ``keys`` (K,) PRNG keys (per-fold shuffle).
        Returns (states, train_totals (K, 6), val_totals (K, 6)) — totals
        are device arrays of sample-weighted metric sums (divide by N/Nv)."""
        old = states.opt_state.hyperparams["learning_rate"]
        lrs = jnp.asarray(lrs, dtype=old.dtype)
        if hasattr(old, "sharding"):  # keep fold-sharded layouts intact
            lrs = jax.device_put(lrs, old.sharding)
        states.opt_state.hyperparams["learning_rate"] = lrs
        fn = self._fold_epoch_fn(tr_i.shape[1], va_i.shape[1],
                                 int(batch_size))
        return fn(states, tr_i, tr_m, va_i, va_m, keys)

    def run_fold_epoch_async(self, state: TrainState, ti, tm, vi, vm,
                             lr: float, key: jax.Array, batch_size: int):
        """One fold's full epoch as a single async dispatch: returns
        (state, train_totals (6,), val_totals (6,)) WITHOUT fetching, so a
        caller can round-robin K folds' epochs back-to-back on the device
        queue and pay one host sync for all of them (fold_parallel.py
        'stream' strategy)."""
        old = state.opt_state.hyperparams["learning_rate"]
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, dtype=old.dtype)
        fn = self._fold_epoch_fn(ti.shape[0], vi.shape[0],
                                 int(batch_size), vmapped=False)
        return fn(state, ti, tm, vi, vm, key)

    def run_train_and_eval_epoch_async(self, state: TrainState, train_loader,
                                       val_loader, lr: float,
                                       key: Optional[jax.Array] = None):
        """Train epoch + validation epoch dispatched WITHOUT a host fetch:
        returns (state, train_totals (6,), val_totals (6,)) as async device
        arrays (sample-weighted metric sums — divide by loader.n).

        This is the building block for epoch pipelining (train_model's
        no-event-horizon window, segtpu/train/loop.py): a caller can chain
        several epochs' dispatches back-to-back on the device queue and pay
        ONE relay round-trip for all their metric fetches."""
        set_learning_rate(state.opt_state, lr)
        (fi, fm), rem = train_loader.batches(key)
        b = train_loader.batch_size
        totals = jnp.zeros(len(METRIC_KEYS))
        if fi.shape[0] > 0:
            fi, fm, valid = self._pad_batches(fi, fm)
            state, ms = self._train_epoch(state, fi, fm, valid)
            totals = totals + jnp.sum(ms, axis=0) * b
        if rem is not None:
            state, m = self._train_step(state, rem[0], rem[1])
            r = rem[0].shape[0]
            totals = totals + jnp.stack([m[k] for k in METRIC_KEYS]) * r
        val_totals = self._eval_totals(state, val_loader)
        return state, totals, val_totals

    def run_train_and_eval_epoch(self, state: TrainState, train_loader,
                                 val_loader, lr: float,
                                 key: Optional[jax.Array] = None):
        """Train epoch + validation epoch with a SINGLE host↔device sync.

        On relay-attached TPUs every device fetch pays ~1s of round-trip
        latency; dispatching both epochs asynchronously and fetching the two
        metric vectors together halves the per-epoch host overhead."""
        state, totals, val_totals = self.run_train_and_eval_epoch_async(
            state, train_loader, val_loader, lr, key)
        tvals, vvals = jax.device_get((totals, val_totals))
        train_metrics = dict(zip(METRIC_KEYS,
                                 map(float, tvals / train_loader.n)))
        val_metrics = dict(zip(METRIC_KEYS,
                               map(float, vvals / val_loader.n)))
        return state, train_metrics, val_metrics


# Bounded: a 50-config grid sweep must not pin 50 engines' compiled
# programs for the process lifetime (VERDICT r3 #8). 16 covers every
# in-repo sweep's concurrent working set (folds of one config share one
# entry; the experiment drivers iterate configs sequentially).
_ENGINE_CACHE: LRUCache = LRUCache(16)


def _loss_cache_key(config: Dict) -> Tuple:
    keys = ("loss_fn", "smooth", "beta", "focal_alpha", "focal_gamma",
            "loss_alpha", "alpha_dice", "alpha_bce", "alpha_focal",
            "tversky_alpha", "tversky_beta", "focal_tversky_gamma",
            "sensitivity_weight", "w_dice", "w_cross", "gamma_dice",
            "gamma_cross", "distance_alpha", "hausdorff_alpha",
            "boundary_theta0", "boundary_theta")
    return tuple(config.get(k) for k in keys)


_OPTIMIZER_KW = ("momentum", "nesterov", "b1", "b2", "adam_eps")


def _optimizer_spec(config: Dict) -> Tuple[str, Tuple]:
    """(name, kwargs-items) from config — cache-key-stable."""
    name = str(config.get("optimizer", "adam")).lower()
    kw = {}
    for k in _OPTIMIZER_KW:
        if config.get(k) is not None:
            kw["eps" if k == "adam_eps" else k] = config[k]
    if name != "sgd":
        kw.pop("momentum", None)
        kw.pop("nesterov", None)
    return name, tuple(sorted(kw.items()))


def get_engine(config: Dict, criterion: Optional[Callable] = None
               ) -> TrainEngine:
    """Engine factory with cross-fold caching.

    config keys (reference names): backbone, use_attention, n_classes.
    If ``criterion`` is given it bypasses the cache (caller-managed)."""
    model_key = (config.get("backbone", "resnet34"),
                 bool(config.get("use_attention", True)),
                 int(config.get("n_classes", 1)),
                 str(config.get("dtype", "float32")),
                 config.get("final_bias_prior"),
                 str(config.get("fuse", "none")),
                 str(config.get("remat", "none")),
                 bool(config.get("reparam_in_train", False)),
                 bool(config.get("fuse_gate", False)))

    def build_model():
        return UNetWithBackbone(
            n_classes=model_key[2], backbone=model_key[0],
            use_attention=model_key[1], dtype=jnp.dtype(model_key[3]),
            final_bias_prior=model_key[4], fuse=model_key[5],
            reparam_in_train=model_key[7], fuse_gate=model_key[8])

    multiclass = model_key[2] > 1
    opt_name, opt_kw = _optimizer_spec(config)
    if criterion is not None:
        return TrainEngine(build_model(), criterion, multiclass=multiclass,
                           remat=model_key[6], optimizer=opt_name,
                           optimizer_kwargs=dict(opt_kw))
    key = model_key + _loss_cache_key(config) + (opt_name, opt_kw)
    if key not in _ENGINE_CACHE:
        if multiclass:
            from segtpu.losses.multiclass import get_multiclass_loss
            loss = get_multiclass_loss(config)
        else:
            loss = get_loss_function(config)
        _ENGINE_CACHE[key] = TrainEngine(build_model(), loss,
                                         multiclass=multiclass,
                                         remat=model_key[6],
                                         optimizer=opt_name,
                                         optimizer_kwargs=dict(opt_kw))
    return _ENGINE_CACHE[key]
