"""Jitted train/eval steps over a TrainState pytree.

Replaces the inner body of the reference's train_one_epoch
(func/train.py:203-235): forward, per-loss mean-reduction, loss_wts-weighted
sum with zero-weight exclusion (static, so excluded losses cost nothing),
grad, clip (inside the optimizer chain), update — all one XLA program.

Data parallelism: the step is written over the GLOBAL batch; under a mesh,
inputs arrive sharded on the 'data' axis and params replicated, and XLA
inserts the gradient all-reduce (the reference's DDP) automatically.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from avt_tpu.train.ops import basic_loss_accuracy


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


def weighted_loss_sum(
    losses: Dict[str, jax.Array], loss_wts: Mapping[str, float]
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Mean-reduce each loss, then sum the ones with weight > 0.

    Parity: func/train.py:207-217 — zero-weight losses are EXCLUDED from the
    graph (so their params see no weight-decay-only updates), and a loss key
    missing from loss_wts is an error, like the reference's attrgetter.
    """
    mean_losses = {k: jnp.mean(v) for k, v in losses.items()}
    total = jnp.zeros((), jnp.float32)
    for key, val in mean_losses.items():
        if key not in loss_wts:
            raise KeyError(
                f"Loss {key!r} has no weight in loss_wts {sorted(loss_wts)}"
            )
        wt = loss_wts[key]
        if wt > 0:
            total = total + wt * val
    return total, mean_losses


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_wts: Mapping[str, float],
    num_classes: Mapping[str, int],
    class_weights: Optional[Mapping[str, jax.Array]] = None,
    donate: bool = True,
    jit_compile: bool = True,
    preprocess_fn: Optional[Callable] = None,
) -> Callable:
    """Build the jitted train step (jit_compile=False returns the raw fn,
    e.g. for wrapping in make_multi_step).

    preprocess_fn(video, rng) -> model-contract video runs INSIDE the jit
    (raw-video path: device-side resize/crop/augment + subclip fold).

    batch: {'video': (B, #clips, [#crops,] C, T, H, W),
            'target': {task: (B,)},
            'target_subclips': optional {task: (B, #clips, T')}}
    Returns (new_state, metrics) where metrics holds the total loss, each
    mean loss, and accuracies — everything the meter layer logs.
    """

    def step_fn(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        target = batch["target"]
        target_shape = next(iter(target.values())).shape

        # BN backbones carry running stats in a 'batch_stats' collection:
        # train mode updates them as a side output (mutable apply); their
        # "grads" are exactly zero (train-mode BN uses batch statistics) and
        # the optimizer freezes them (see build_optimizer's label rule).
        has_batch_stats = isinstance(state.params, dict) and "batch_stats" in state.params

        video = batch["video"]
        if preprocess_fn is not None:
            video = preprocess_fn(video, jax.random.fold_in(rng, 2))

        def loss_fn(variables):
            rngs = {"dropout": rng, "cloze": jax.random.fold_in(rng, 1)}
            if has_batch_stats:
                (outputs, aux_losses), mut = model.apply(
                    variables, video, target_shape, train=True,
                    rngs=rngs, mutable=["batch_stats"],
                )
            else:
                outputs, aux_losses = model.apply(
                    variables, video, target_shape, train=True,
                    rngs=rngs,
                )
                mut = {}
            tsub = batch.get("target_subclips")
            if tsub is not None:
                # fold (B, #clips, T') -> (B, #clips*T') per reference's
                # mode over the frame axis within each subclip
                tsub = {k: v.reshape(v.shape[0], v.shape[1], -1) for k, v in tsub.items()}
            losses, accuracies = basic_loss_accuracy(
                outputs,
                target,
                tsub,
                num_classes=num_classes,
                class_weights=class_weights,
            )
            losses.update(aux_losses)
            total, mean_losses = weighted_loss_sum(losses, loss_wts)
            return total, (mean_losses, accuracies, mut)

        (total, (mean_losses, accuracies, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if has_batch_stats:
            new_params = {**new_params, "batch_stats": mut["batch_stats"]}
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        metrics = {"loss": total}
        metrics.update({f"loss/{k}": v for k, v in mean_losses.items()})
        metrics.update(accuracies)
        return new_state, metrics

    if not jit_compile:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_ssl_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_wts: Mapping[str, float],
    num_classes: Mapping[str, int],
    reg_criterion: Callable,
    *,
    nfutures: int = 1,
    future_target: str = "temp_agg_projected",
    incur_loss_style: str = "separately",
    combine_future_losses: str = "min",
    cumulative_future: bool = False,
    class_weights: Optional[Mapping[str, jax.Array]] = None,
    use_cls_loss: bool = True,
    donate: bool = True,
    jit_compile: bool = True,
) -> Callable:
    """Self-supervised future-feature train step.

    Parity target: reference func/train_eval_ops.py:148-231 (PredFutureFeat):
    the observed clip and its nfutures future clips concat into one batch for
    a single forward; classification losses apply to the observed half; a
    regression/NCE loss ties outputs['future_projected'] to the future
    clips' `future_target` features — per-future 'separately' (combined by
    min/mean/max) or 'together' MIL-style.

    batch keys: 'video', 'future_<i>_video' (i < nfutures), 'target',
    optional 'target_subclips'.
    """
    import jax.numpy as _jnp

    combine = {
        "min": _jnp.min,
        "max": _jnp.max,
        "mean": _jnp.mean,
        "sum": _jnp.sum,
    }[combine_future_losses]

    def step_fn(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        target = batch["target"]
        B = next(iter(target.values())).shape[0]

        def loss_fn(params):
            all_videos = [batch["video"]] + [
                batch[f"future_{i}_video"] for i in range(nfutures)
            ]
            video = _jnp.concatenate(all_videos, axis=0)
            outputs_full, aux_losses = model.apply(
                params, video, train=True,
                rngs={"dropout": rng, "cloze": jax.random.fold_in(rng, 1)},
            )
            outputs = {k: v[:B] for k, v in outputs_full.items()}
            if use_cls_loss:
                tsub = batch.get("target_subclips")
                if tsub is not None:
                    tsub = {
                        k: v.reshape(v.shape[0], v.shape[1], -1)
                        for k, v in tsub.items()
                    }
                losses, accuracies = basic_loss_accuracy(
                    outputs, target, tsub,
                    num_classes=num_classes, class_weights=class_weights,
                )
            else:
                losses, accuracies = {}, {}
            # aux losses cover the full (obs+future) batch, as in the
            # reference (train_eval_ops.py:200)
            losses.update(aux_losses)
            anchor = outputs["future_projected"]
            if incur_loss_style == "separately":
                reg_losses = []
                for i in range(nfutures):
                    fut = outputs_full[future_target][(i + 1) * B:(i + 2) * B]
                    if cumulative_future:
                        fut = _jnp.cumsum(fut, axis=0) / _jnp.arange(
                            1, fut.shape[0] + 1, dtype=fut.dtype
                        )[:, None]
                    reg_losses.append(reg_criterion(anchor, fut))
                losses["reg"] = combine(_jnp.stack(reg_losses))
            elif incur_loss_style == "together":
                fut = outputs_full[future_target][B:]
                fut = fut.reshape((nfutures, B) + fut.shape[1:]).transpose(1, 0, 2)
                losses["reg"] = reg_criterion(anchor, fut)
            else:
                raise NotImplementedError(incur_loss_style)
            total, mean_losses = weighted_loss_sum(losses, loss_wts)
            return total, (mean_losses, accuracies)

        (total, (mean_losses, accuracies)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        metrics = {"loss": total}
        metrics.update({f"loss/{k}": v for k, v in mean_losses.items()})
        metrics.update(accuracies)
        return new_state, metrics

    if not jit_compile:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_multi_step(step_fn: Callable, unroll_steps: int) -> Callable:
    """Scan `unroll_steps` train steps inside ONE jitted dispatch.

    Host->device dispatch has a fixed per-call cost (especially through
    remote-tunnel runtimes); scanning k prefetched batches per dispatch
    amortizes it. batches: a pytree whose leaves are stacked on a leading
    (unroll_steps, ...) axis. Returns (state, metrics stacked (K, ...)) —
    one fetch gives the meters every step's values.
    """

    def multi(state, batches, rng):
        def body(state, inp):
            i, batch = inp
            new_state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
            return new_state, metrics

        idx = jnp.arange(unroll_steps)
        return jax.lax.scan(body, state, (idx, batches))

    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(
    model,
    num_classes: Mapping[str, int],
    class_weights: Optional[Mapping[str, jax.Array]] = None,
    store_endpoint: str = "logits",
    preprocess_fn: Optional[Callable] = None,
) -> Callable:
    """Build the jitted eval step.

    Returns per-batch: every model output whose key starts with
    store_endpoint (reference func/train.py:369-372 — 'logits' for normal
    eval, or a feature endpoint like 'temp_agg'/'backbone_mean' for
    feature extraction), unreduced 'loss/<task>', and accuracies — what the
    H5 result sink stores (func/train.py:367-403).
    """

    def step_fn(params, batch) -> Dict[str, jax.Array]:
        target = batch["target"]
        target_shape = next(iter(target.values())).shape
        video = batch["video"]
        if preprocess_fn is not None:
            video = preprocess_fn(video)
        outputs, aux_losses = model.apply(
            params, video, target_shape, train=False
        )
        tsub = batch.get("target_subclips")
        if tsub is not None:
            tsub = {k: v.reshape(v.shape[0], v.shape[1], -1) for k, v in tsub.items()}
        losses, accuracies = basic_loss_accuracy(
            outputs, target, tsub,
            num_classes=num_classes, class_weights=class_weights,
        )
        res: Dict[str, jax.Array] = {
            k: v for k, v in outputs.items() if k.startswith(store_endpoint)
        }
        for task in target:
            res[f"loss/cls_{task}"] = losses[f"cls_{task}"]
        for k, v in aux_losses.items():
            res[f"aux_loss/{k}"] = jnp.mean(v)
        res.update(accuracies)
        return res

    return jax.jit(step_fn)


def make_forward_fn(model) -> Callable:
    """Plain jitted forward (used by bench + graft entry)."""

    def fwd(params, video):
        outputs, _ = model.apply(params, video, train=False)
        return outputs

    return jax.jit(fwd)
