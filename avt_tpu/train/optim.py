"""Optimizers, LR schedules, per-module param groups (optax).

Parity targets:
  * common/scheduler.py: WarmupMultiStepLR, CosineLR (eta_min scaled by
    world size, zero LR past T_max), Warmup wrapper (linear ramp from
    init_lr_ratio over warmup iters, then delegate with a fresh counter).
  * func/train.py:696-742: per-module [module, lr, wd] groups with
    bias/norm weight-decay scaling, LR x world_size (x batch_size opt),
    lr==0 groups frozen.
  * conf/opt/optimizer/*: sgd (momentum .9, optional nesterov: L2-style
    wd), adam/adamW, adafactor.

Schedules are pure functions of the iteration count; the torch stepping
quirks are folded in (the Warmup wrapper hands the base scheduler a counter
that starts at 1 on the first post-warmup step — see warmup_schedule).
"""
from __future__ import annotations

import fnmatch
import math
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


# --------------------------------------------------- ReduceLROnPlateau
class PlateauScaleState(NamedTuple):
    """Per-group LR multiplier the host steps on the val metric.

    For torch SGD/Adam/AdamW the LR multiplies the final update (after
    momentum/moment normalization), so scaling the optax update stream by
    `mult` is EXACTLY torch's `group['lr'] *= factor`. `floor` encodes
    torch's absolute min_lr as min_lr / base_lr.
    """

    mult: jnp.ndarray
    floor: jnp.ndarray


def scale_by_plateau(floor: float = 0.0) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return PlateauScaleState(
            jnp.ones((), jnp.float32), jnp.asarray(floor, jnp.float32)
        )

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u: u * state.mult, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def apply_plateau_factor(opt_state, factor: float):
    """Multiply every PlateauScaleState in the opt_state tree by factor
    (clamped at its floor) — torch's per-group lr reduction."""

    def fn(node):
        if isinstance(node, PlateauScaleState):
            return PlateauScaleState(
                jnp.maximum(node.mult * factor, node.floor), node.floor
            )
        return node

    return jax.tree.map(
        fn, opt_state, is_leaf=lambda n: isinstance(n, PlateauScaleState)
    )


class ReduceLROnPlateau:
    """Host-side plateau tracker; torch.optim.lr_scheduler.ReduceLROnPlateau
    step-for-step parity (common/scheduler.py:78-85 wraps it unchanged;
    stepped once per eval on the val metric, func/train.py:832-834).

    step(opt_state, metric) returns the (possibly reduced) opt_state. The
    multiplier itself lives in the optax state so it checkpoints with the
    TrainState; the best/bad-epoch counters ride the checkpoint's host_state
    (state_dict/load_state_dict, wired by run_training).
    """

    def __init__(
        self,
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        threshold_mode: str = "rel",
        cooldown: int = 0,
        **_ignored,
    ):
        assert mode in ("min", "max") and threshold_mode in ("rel", "abs")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.cooldown_counter = 0
        self.num_bad_epochs = 0
        self.best = -float("inf") if mode == "max" else float("inf")

    def _is_better(self, a: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return a < self.best * (1.0 - self.threshold)
            return a < self.best - self.threshold
        if self.threshold_mode == "rel":
            return a > self.best * (1.0 + self.threshold)
        return a > self.best + self.threshold

    def step(self, opt_state, metric: float):
        if self._is_better(float(metric)):
            self.best = float(metric)
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            opt_state = apply_plateau_factor(opt_state, self.factor)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return opt_state

    def __call__(self, train_state, metric: float):
        """run_training plateau hook: returns the updated TrainState."""
        return train_state.replace(
            opt_state=self.step(train_state.opt_state, metric)
        )

    def state_dict(self) -> dict:
        """Host counters for checkpointing (the multiplier itself lives in
        opt_state and checkpoints with the TrainState)."""
        return {
            "best": float(self.best),
            "num_bad_epochs": int(self.num_bad_epochs),
            "cooldown_counter": int(self.cooldown_counter),
        }

    def load_state_dict(self, d: dict) -> None:
        self.best = float(d["best"])
        self.num_bad_epochs = int(d["num_bad_epochs"])
        self.cooldown_counter = int(d["cooldown_counter"])


# --------------------------------------------------------------- schedules
def multistep_schedule(
    base_lr: float,
    milestone_epochs: Sequence[int],
    iters_per_epoch: int,
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 3,
    warmup_epochs: int = 5,
    warmup_method: str = "linear",
) -> Schedule:
    """WarmupMultiStepLR (common/scheduler.py:9-54)."""
    milestones = jnp.asarray([iters_per_epoch * m for m in milestone_epochs])
    warmup_iters = max(warmup_epochs * iters_per_epoch, 1)

    def fn(it):
        it = jnp.asarray(it, dtype=jnp.float32)
        if warmup_method == "constant":
            wf = jnp.where(it < warmup_iters, warmup_factor, 1.0)
        else:
            alpha = it / warmup_iters
            wf = jnp.where(
                it < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
            )
        power = jnp.sum(it >= milestones) if len(milestone_epochs) else 0
        return base_lr * wf * gamma**power

    return fn


def cosine_schedule(
    base_lr: float,
    num_epochs: int,
    iters_per_epoch: int,
    eta_min: float = 0.0,
    world_size: int = 1,
) -> Schedule:
    """CosineLR (common/scheduler.py:57-75): zero LR past T_max."""
    t_max = num_epochs * iters_per_epoch
    eta = eta_min * world_size

    def fn(it):
        it = jnp.asarray(it, dtype=jnp.float32)
        cos = eta + (base_lr - eta) * (1 + jnp.cos(jnp.pi * it / t_max)) / 2
        return jnp.where(it < t_max, cos, 0.0)

    return fn


def constant_schedule(base_lr: float) -> Schedule:
    return lambda it: jnp.full((), base_lr, dtype=jnp.float32)


def warmup_schedule(
    base_schedule: Schedule,
    base_lr: float,
    warmup_epochs: int,
    iters_per_epoch: int,
    init_lr_ratio: float = 0.0,
    affine_floor: float = 0.0,
) -> Schedule:
    """Warmup wrapper (common/scheduler.py:88-136).

    For it < W: lr = base_lr * (r + (1-r) * it/W). From it >= W the base
    scheduler takes over with its counter at it - (W-1) (the torch wrapper
    only starts stepping the base scheduler after warmup, and stepping
    increments from the constructor's initial 0).

    Reference quirk replicated: torch's recursive scheduler chaining makes
    the base schedule continue RELATIVE to the last warmup LR — which is
    base_lr * (r + (1-r)(W-1)/W), never quite base_lr — so the post-warmup
    schedule is transformed AROUND the recursion's fixed point
    `affine_floor` (eta_min for cosine; 0 for multiplicative schedules):
    torch's recursion lr_{t+1} = ratio*(lr_t - eta_min) + eta_min seeds from
    the last warmup LR, giving lr_t = eta + (lwf*base_lr - eta) * shape(t),
    i.e. an affine factor s = (lwf*base_lr - eta)/(base_lr - eta) on the
    (base - eta) excess. Verified step-for-step against the reference
    Warmup(CosineLR) in tests/test_diff_reference.py.
    """
    w = max(warmup_epochs * iters_per_epoch, 1)
    r = init_lr_ratio if w > 1 else 1.0
    last_warmup_factor = r + (1 - r) * (w - 1) / w
    denom = base_lr - affine_floor
    scale = (
        (last_warmup_factor * base_lr - affine_floor) / denom
        if denom != 0.0 else 1.0
    )

    def fn(it):
        it = jnp.asarray(it, dtype=jnp.float32)
        ramp = base_lr * (r + (1 - r) * it / w)
        base = base_schedule(jnp.maximum(it - (w - 1), 0))
        post = affine_floor + scale * (base - affine_floor)
        # past-T_max cosine pins lr to exactly 0 (not the affine floor)
        post = jnp.where(base == 0.0, 0.0, post)
        return jnp.where(it < w, ramp, post)

    return fn


def build_schedule(
    name: str,
    base_lr: float,
    *,
    iters_per_epoch: int,
    num_epochs: int,
    world_size: int = 1,
    warmup_epochs: int = 0,
    warmup_init_lr_ratio: float = 0.0,
    **kwargs,
) -> Schedule:
    """Build the full (warmup-wrapped) schedule by name.

    Matches the reference composition: cosine T_max uses
    (num_epochs - warmup_epochs) via the `minus` resolver in its config.
    """
    affine_floor = 0.0
    if name == "cosine":
        base = cosine_schedule(
            base_lr,
            num_epochs - warmup_epochs,
            iters_per_epoch,
            eta_min=kwargs.get("eta_min", 0.0),
            world_size=world_size,
        )
        affine_floor = kwargs.get("eta_min", 0.0) * world_size
    elif name == "warmup_multi_step":
        base = multistep_schedule(
            base_lr,
            kwargs.get("milestone_epochs", []),
            iters_per_epoch,
            gamma=kwargs.get("gamma", 0.1),
            warmup_factor=kwargs.get("warmup_factor", 1.0 / 3),
            warmup_epochs=kwargs.get("scheduler_warmup_epochs", 0),
            warmup_method=kwargs.get("warmup_method", "linear"),
        )
    elif name in ("constant", "reduce_lr_on_plateau"):
        # the in-jit schedule is constant; plateau reduction happens through
        # the scale_by_plateau multiplier in each group's optax chain,
        # stepped on the val metric by ReduceLROnPlateau.step via
        # run_training's `plateau` hook (loop.py)
        base = constant_schedule(base_lr)
    else:
        raise NotImplementedError(f"Unknown scheduler {name!r}")
    return warmup_schedule(
        base, base_lr, warmup_epochs, iters_per_epoch, warmup_init_lr_ratio,
        affine_floor=affine_floor,
    )


# ------------------------------------------------------------- optimizers
def _base_optimizer(
    name: str,
    schedule: Schedule,
    wd: float,
    *,
    momentum: float = 0.9,
    nesterov: bool = False,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    momentum_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """torch-parity single-group optimizer.

    torch SGD/Adam apply weight decay L2-style (grad += wd * param) BEFORE
    momentum — optax.add_decayed_weights before the update rule matches.
    AdamW decays decoupled.

    momentum_dtype='bfloat16' stores the momentum/first-moment buffer in
    bf16: at AVT scale (~390M params) the optimizer update is pure HBM
    traffic, and halving the accumulator read+write shaves ~20% off it.
    Momentum is decayed 0.9x each step (not a long-horizon accumulator), so
    bf16 rounding stays below the gradient noise floor.
    """
    acc = jnp.bfloat16 if momentum_dtype in ("bf16", "bfloat16") else None
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(
                schedule, momentum=momentum, nesterov=nesterov,
                accumulator_dtype=acc,
            ),
        )
    if name == "adam":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.adam(
                schedule, b1=betas[0], b2=betas[1], eps=eps, mu_dtype=acc
            ),
        )
    if name == "adamw":
        return optax.adamw(
            schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd,
            mu_dtype=acc,
        )
    if name == "adafactor":
        return transformers_adafactor(schedule, weight_decay=wd)
    raise NotImplementedError(f"Unknown optimizer {name!r}")


class AdafactorState(NamedTuple):
    count: jax.Array
    row: Any  # params-shaped trees; () placeholders where unused
    col: Any
    v: Any


def transformers_adafactor(
    schedule: Schedule,
    *,
    weight_decay: float = 0.0,
    eps1: float = 1e-30,
    eps2: float = 1e-3,
    clip_threshold: float = 1.0,
    decay_rate: float = -0.8,
    scale_parameter: bool = True,
    relative_step: bool = True,
    warmup_init: bool = False,
) -> optax.GradientTransformation:
    """transformers.Adafactor, exactly (the reference's optimizer:
    conf/opt/optimizer/adafactor.yaml -> transformers.Adafactor).

    Faithful quirk: func/train.py:744 passes per-group lr dicts, which
    bypass the constructor's manual-lr check, and with the default
    relative_step=True `_get_lr` IGNORES both the configured LR and every
    scheduler step — the effective step size is
    `min(1e-2, 1/sqrt(t)) * max(eps2, RMS(param))`. `schedule` is only
    consulted when relative_step=False (the T5-style external-LR mode).
    Weight decay is decoupled and scaled by that same computed lr
    (p -= wd * lr * p), unlike torch AdamW's schedule-scaled decay.

    Factoring matches transformers: every >=2D gradient keeps row/col
    second-moment accumulators over the LAST TWO axes (no
    min_dim_size_to_factor cutoff like optax's), 1D/scalars keep the full
    accumulator.
    """

    def _placeholder():
        return jnp.zeros((), jnp.float32)

    def init_fn(params):
        def row_of(p):
            return (jnp.zeros(p.shape[:-1], jnp.float32) if p.ndim >= 2
                    else _placeholder())

        def col_of(p):
            return (jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
                    if p.ndim >= 2 else _placeholder())

        def v_of(p):
            return (jnp.zeros(p.shape, jnp.float32) if p.ndim < 2
                    else _placeholder())

        return AdafactorState(
            count=jnp.zeros((), jnp.int32),
            row=jax.tree.map(row_of, params),
            col=jax.tree.map(col_of, params),
            v=jax.tree.map(v_of, params),
        )

    def _rms(x):
        return jnp.sqrt(jnp.mean(jnp.square(x)))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("adafactor requires params")
        t = (state.count + 1).astype(jnp.float32)
        if relative_step:
            min_step = 1e-6 * t if warmup_init else 1e-2
            step_sz = jnp.minimum(min_step, 1.0 / jnp.sqrt(t))
        else:
            step_sz = schedule(state.count)
        beta2t = 1.0 - t ** decay_rate

        def one(g, r, c, v, p):
            g32 = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            lr = step_sz
            if scale_parameter:
                lr = lr * jnp.maximum(eps2, _rms(p32))
            sq = jnp.square(g32) + eps1
            if g.ndim >= 2:
                r = beta2t * r + (1 - beta2t) * jnp.mean(sq, axis=-1)
                c = beta2t * c + (1 - beta2t) * jnp.mean(sq, axis=-2)
                rf = jax.lax.rsqrt(
                    r / jnp.mean(r, axis=-1, keepdims=True))[..., None]
                cf = jax.lax.rsqrt(c)[..., None, :]
                u = rf * cf * g32
            else:
                v = beta2t * v + (1 - beta2t) * sq
                u = jax.lax.rsqrt(v) * g32
            u = u / jnp.maximum(1.0, _rms(u) / clip_threshold)
            u = u * lr
            delta = -(u + weight_decay * lr * p32)
            return delta.astype(p.dtype), r, c, v

        out = jax.tree.map(one, updates, state.row, state.col, state.v,
                           params)
        # unzip the per-leaf 4-tuples back into parallel trees
        is4 = lambda x: isinstance(x, tuple) and len(x) == 4  # noqa: E731
        new_updates = jax.tree.map(lambda o: o[0], out, is_leaf=is4)
        new_state = AdafactorState(
            count=state.count + 1,
            row=jax.tree.map(lambda o: o[1], out, is_leaf=is4),
            col=jax.tree.map(lambda o: o[2], out, is_leaf=is4),
            v=jax.tree.map(lambda o: o[3], out, is_leaf=is4),
        )
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _is_bias_or_norm(path_str: str, leaf) -> bool:
    """bias/batch-norm/layer-norm params get bias_bn_wd_scale applied.

    Deliberately broader than the reference's literal rule
    (func/train.py:714: ``name.endswith('bias') or '.bn' in name``): torch
    LayerNorm scales are named ``*.weight`` so the reference gives them FULL
    weight decay, while this treats them as norm params. The delta is inert
    for every shipped experiment — the only expt with
    ``bias_bn_wd_scale != 1.0`` is the test-only ``05_ek100_rustm``
    (no optimizer updates) — and matches the rule's evident intent.
    """
    name = path_str.rsplit("/", 1)[-1]
    return name in ("bias",) or "LayerNorm" in path_str or "/bn" in path_str or (
        name == "scale"
    )


def build_optimizer(
    params,
    lr_wd: Sequence[Tuple],
    *,
    optimizer_name: str = "sgd",
    scheduler_name: str = "cosine",
    iters_per_epoch: int,
    num_epochs: int,
    world_size: int = 1,
    batch_size: Optional[int] = None,
    scale_lr_by_bs: bool = False,
    bias_bn_wd_scale: float = 1.0,
    grad_clip_max_norm: Optional[float] = None,
    warmup_epochs: int = 0,
    warmup_init_lr_ratio: float = 0.0,
    optimizer_kwargs: Optional[dict] = None,
    scheduler_kwargs: Optional[dict] = None,
):
    """Per-module param groups -> optax.multi_transform.

    lr_wd: list of [module_name(s), lr, wd]; '__all__' matches everything.
    LR is scaled by world_size (and batch_size if scale_lr_by_bs), as in
    func/train.py:718-720. Params whose group lr == 0 are frozen
    (set_to_zero), matching :735-742. First matching group wins (the
    reference double-updates on overlap — a documented TODO there, not
    replicated).

    Returns (optax transformation, schedules dict for logging).
    """
    optimizer_kwargs = optimizer_kwargs or {}
    scheduler_kwargs = scheduler_kwargs or {}

    groups: List[Tuple[Tuple[str, ...], float, float]] = []
    for entry in lr_wd:
        mods, lr, wd = entry
        if isinstance(mods, str):
            mods = (mods,)
        groups.append((tuple(mods), float(lr), float(wd)))

    lr_scale = world_size * (batch_size if scale_lr_by_bs and batch_size else 1)

    def label_of(path_str: str, leaf) -> str:
        # non-param variable collections (BN running stats) never train;
        # they're updated by the mutable apply in the train step
        if path_str.startswith("batch_stats/"):
            return "frozen"
        for gi, (mods, lr, wd) in enumerate(groups):
            for mod in mods:
                if (
                    mod == "__all__"
                    or path_str.startswith(mod + "/")
                    or f"/{mod}/" in f"/{path_str}"
                    or fnmatch.fnmatch(path_str, mod)
                ):
                    if lr == 0:
                        return "frozen"
                    suffix = "_bn" if _is_bias_or_norm(path_str, leaf) else ""
                    return f"g{gi}{suffix}"
        return "frozen"  # unmatched params don't train (reference drops them)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, leaf: label_of(_path_str(path), leaf), params
    )

    transforms: Dict[str, optax.GradientTransformation] = {
        "frozen": optax.set_to_zero()
    }
    schedules: Dict[str, Schedule] = {}
    used_labels = set(jax.tree.leaves(labels))
    for gi, (mods, lr, wd) in enumerate(groups):
        for suffix, wd_scale in (("", 1.0), ("_bn", bias_bn_wd_scale)):
            label = f"g{gi}{suffix}"
            if label not in used_labels:
                continue
            sched = build_schedule(
                scheduler_name,
                lr * lr_scale,
                iters_per_epoch=iters_per_epoch,
                num_epochs=num_epochs,
                world_size=world_size,
                warmup_epochs=warmup_epochs,
                warmup_init_lr_ratio=warmup_init_lr_ratio,
                **scheduler_kwargs,
            )
            schedules[label] = sched
            transforms[label] = _base_optimizer(
                optimizer_name, sched, wd * wd_scale, **optimizer_kwargs
            )
            if (scheduler_name == "reduce_lr_on_plateau"
                    and optimizer_name != "adafactor"):
                # host-stepped LR multiplier appended per group; floor
                # encodes torch's absolute min_lr for THIS group's base lr.
                # adafactor is excluded: transformers.Adafactor._get_lr
                # ignores group['lr'] under relative_step, so the
                # reference's plateau reduction is a no-op there
                floor = scheduler_kwargs.get("min_lr", 0.0) / max(
                    lr * lr_scale, 1e-30
                )
                transforms[label] = optax.chain(
                    transforms[label], scale_by_plateau(floor)
                )

    tx = optax.multi_transform(transforms, labels)
    if grad_clip_max_norm is not None:
        # The reference clips the global norm over OPTIMIZED params only
        # (func/train.py:225-231): zero frozen grads before the clip so they
        # don't inflate the norm.
        frozen_mask = jax.tree.map(lambda l: l == "frozen", labels)
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), frozen_mask),
            optax.clip_by_global_norm(grad_clip_max_norm),
            tx,
        )
    return tx, schedules
