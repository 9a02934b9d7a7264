"""Whole-training-run fusion: the full epoch loop as ONE device program.

The reference's training loop makes thousands of host↔device round trips
(train.py:38-60); our epoch-scan engine reduced that to one sync per epoch.
This module goes the rest of the way: the epoch loop ITSELF — per-epoch
shuffling, train scan, validation, ReduceLROnPlateau, early stopping and
best-weights tracking (train.py:177-226 semantics, exactly) — runs inside a
single jit-compiled `lax.scan` over epochs. One dispatch + one result fetch
per *training run*. On relay-attached TPUs (~1 s RTT per sync) this turns a
23-epoch run from ~26 s into ~3 s; on directly-attached chips it removes
all per-epoch dispatch overhead.

Early stopping cannot break a scan, so epochs after the stop flag are
masked with `lax.cond` no-ops; the scan length is bucketed so nearby
`num_epochs` values share one compiled program.

STATUS (measured, v5e via relay): EXPERIMENTAL, opt-in via config
``fused_run=True``. Semantics match the stepwise loop exactly
(tests/test_fused_run.py), but on this stack it does NOT pay: the relay
batches the loop's per-epoch dispatches well (~0.45 s/epoch), while the
fused program costs ~0.9 s/epoch (per-epoch best-weights tree selects +
scan-carry copies) and the masked epochs are NOT skipped at runtime
(the conditional lowers to full execution inside the scan). Kept for rigs
with genuinely high dispatch latency and as the scaffold for
multi-epoch-per-sync variants. See PERF.md.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from segtpu.train.engine import METRIC_KEYS, TrainEngine, TrainState


def _bucket_epochs(n: int) -> int:
    if n <= 10:
        return n
    return -(-n // 10) * 10


def _replace_lr(opt_state, lr):
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def run_training_fused(engine: TrainEngine, state: TrainState,
                       train_images, train_masks, val_images, val_masks,
                       batch_size: int, num_epochs: int, lr0: float,
                       epoch_keys, scheduler_params: Optional[Dict] = None,
                       es_patience: int = 7, es_min_delta: float = 0.001
                       ) -> Dict:
    """Run a full training loop on device.

    scheduler_params: None (constant LR) or dict(factor, patience,
    threshold, min_lr) — ReduceLROnPlateau mode='max' semantics.
    epoch_keys: (num_epochs,) PRNG keys (one per epoch, matching the
    stepwise loop's split chain).

    Returns dict: train_history/val_history (epochs_ran, len(METRIC_KEYS))
    numpy, lr_history, best_iou, best_epoch, epochs_ran, state (best
    weights restored), final_state.
    """
    n = train_images.shape[0]
    b = batch_size
    nf = n // b
    rem = n - nf * b
    e_pad = _bucket_epochs(num_epochs)

    sched_on = scheduler_params is not None
    sp = scheduler_params or {}
    sched_factor = jnp.float32(sp.get("factor", 0.5))
    sched_patience = jnp.int32(sp.get("patience", 3))
    sched_threshold = jnp.float32(sp.get("threshold", 1e-4))
    sched_min_lr = jnp.float32(sp.get("min_lr", 0.0))
    es_patience_j = jnp.int32(es_patience)
    es_min_delta_j = jnp.float32(es_min_delta)
    num_epochs_j = jnp.int32(num_epochs)

    # validation batches are fixed across epochs (no shuffle)
    nvf = val_images.shape[0] // b
    v_rem = val_images.shape[0] - nvf * b
    vi_full = val_images[: nvf * b].reshape(nvf, b, *val_images.shape[1:])
    vm_full = val_masks[: nvf * b].reshape(nvf, b, *val_masks.shape[1:])
    vi_rem = val_images[nvf * b:] if v_rem else None
    vm_rem = val_masks[nvf * b:] if v_rem else None

    if len(epoch_keys) < e_pad:
        extra = jax.random.split(jax.random.key(0), e_pad - len(epoch_keys))
        epoch_keys = jnp.concatenate([jnp.asarray(epoch_keys), extra])

    zeros_metrics = jnp.zeros(len(METRIC_KEYS))

    def train_one_epoch(st: TrainState, key, lr):
        st = st.replace(opt_state=_replace_lr(st.opt_state, lr))
        perm = jax.random.permutation(key, n)
        imgs = jnp.take(train_images, perm, axis=0)
        msks = jnp.take(train_masks, perm, axis=0)
        totals = zeros_metrics
        if nf > 0:
            fi = imgs[: nf * b].reshape(nf, b, *imgs.shape[1:])
            fm = msks[: nf * b].reshape(nf, b, *msks.shape[1:])

            def body(s, batch):
                s, m = engine._train_step_impl(s, batch[0], batch[1])
                return s, jnp.stack([m[k] for k in METRIC_KEYS])

            st, ms = jax.lax.scan(body, st, (fi, fm))
            totals = totals + jnp.sum(ms, axis=0) * b
        if rem:
            st, m = engine._train_step_impl(st, imgs[nf * b:], msks[nf * b:])
            totals = totals + jnp.stack([m[k] for k in METRIC_KEYS]) * rem
        return st, totals / n

    def eval_epoch(st: TrainState):
        totals = zeros_metrics
        if nvf > 0:
            def body(_, batch):
                m = engine._eval_step_impl(st, batch[0], batch[1])
                return None, jnp.stack([m[k] for k in METRIC_KEYS])

            _, ms = jax.lax.scan(body, None, (vi_full, vm_full))
            totals = totals + jnp.sum(ms, axis=0) * b
        if v_rem:
            m = engine._eval_step_impl(st, vi_rem, vm_rem)
            totals = totals + jnp.stack([m[k] for k in METRIC_KEYS]) * v_rem
        return totals / val_images.shape[0]

    def epoch_step(carry, inp):
        (st, best_p, best_bs, best_iou, best_found, best_epoch, lr,
         s_best, s_first, s_bad, e_best, e_first, e_count, stopped,
         epochs_ran) = carry
        e_idx, key = inp
        active = jnp.logical_and(~stopped, e_idx < num_epochs_j)

        def do(_):
            st2, train_m = train_one_epoch(st, key, lr)
            val_m = eval_epoch(st2)
            val_iou = val_m[METRIC_KEYS.index("iou")]

            # ReduceLROnPlateau (mode max, rel threshold) — optim.py parity
            if sched_on:
                better = jnp.where(
                    s_first, True,
                    jnp.where(s_best >= 0,
                              val_iou > s_best * (1 + sched_threshold),
                              val_iou > s_best * (1 - sched_threshold)))
                ns_best = jnp.where(better, val_iou, s_best)
                ns_bad = jnp.where(better, 0, s_bad + 1)
                reduce_now = ns_bad > sched_patience
                n_lr = jnp.where(reduce_now,
                                 jnp.maximum(lr * sched_factor, sched_min_lr),
                                 lr)
                ns_bad = jnp.where(reduce_now, 0, ns_bad)
                ns_first = jnp.asarray(False)
            else:
                ns_best, ns_bad, n_lr, ns_first = s_best, s_bad, lr, s_first

            # best-weights tracking (train.py:207-210): strictly greater
            improved = val_iou > best_iou
            nb_p = jax.tree.map(
                lambda new, old: jnp.where(improved, new, old),
                st2.params, best_p)
            nb_bs = jax.tree.map(
                lambda new, old: jnp.where(improved, new, old),
                st2.batch_stats, best_bs)
            nb_iou = jnp.where(improved, val_iou, best_iou)
            nb_found = jnp.logical_or(best_found, improved)
            nb_epoch = jnp.where(improved, e_idx, best_epoch)

            # early stopping (utils.py:174-190)
            es_better = jnp.logical_or(e_first,
                                       val_iou > e_best + es_min_delta_j)
            ne_best = jnp.where(es_better, val_iou, e_best)
            ne_count = jnp.where(es_better, 0, e_count + 1)
            n_stopped = ne_count >= es_patience_j
            ne_first = jnp.asarray(False)

            new_carry = (st2, nb_p, nb_bs, nb_iou, nb_found, nb_epoch, n_lr,
                         ns_best, ns_first, ns_bad, ne_best, ne_first,
                         ne_count, n_stopped, epochs_ran + 1)
            return new_carry, (train_m, val_m, n_lr)

        def skip(_):
            return carry, (jnp.full(len(METRIC_KEYS), jnp.nan),
                           jnp.full(len(METRIC_KEYS), jnp.nan),
                           jnp.float32(jnp.nan))

        return jax.lax.cond(active, do, skip, None)

    @jax.jit
    def run(state, keys):
        carry = (state, state.params, state.batch_stats, jnp.float32(0.0),
                 jnp.asarray(False), jnp.int32(0), jnp.float32(lr0),
                 jnp.float32(0.0), jnp.asarray(True), jnp.int32(0),
                 jnp.float32(0.0), jnp.asarray(True), jnp.int32(0),
                 jnp.asarray(False), jnp.int32(0))
        carry, (train_h, val_h, lr_h) = jax.lax.scan(
            epoch_step, carry, (jnp.arange(e_pad), keys[:e_pad]))
        (st, best_p, best_bs, best_iou, best_found, best_epoch, lr,
         *_rest, epochs_ran) = carry
        return (st, best_p, best_bs, best_iou, best_found, best_epoch,
                train_h, val_h, lr_h, epochs_ran)

    (st, best_p, best_bs, best_iou, best_found, best_epoch,
     train_h, val_h, lr_h, epochs_ran) = run(state, jnp.asarray(epoch_keys))

    (best_iou, best_found, best_epoch, train_h, val_h, lr_h, epochs_ran) = \
        jax.device_get((best_iou, best_found, best_epoch, train_h, val_h,
                        lr_h, epochs_ran))
    e_ran = int(epochs_ran)
    final_state = st
    if bool(best_found):
        st = st.replace(params=best_p, batch_stats=best_bs)

    def rows(h):
        return [dict(zip(METRIC_KEYS, map(float, r))) for r in h[:e_ran]]

    return {
        "train_history": rows(train_h),
        "val_history": rows(val_h),
        "lr_history": [float(x) for x in lr_h[:e_ran]],
        "best_iou": float(best_iou),
        "best_found": bool(best_found),
        "best_epoch": int(best_epoch),
        "epochs_ran": e_ran,
        "state": st,
        "final_state": final_state,
    }
