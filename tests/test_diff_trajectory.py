"""Multi-step training-TRAJECTORY differential vs the reference source.

The other diff suites pin each surface separately: AVTh forward
(test_diff_reference), losses (ditto), per-iter LR traces (ditto), and
one-step gradients (test_diff_ssl_op). This suite composes them the way
`func/train.py:221-265` does — loss -> backward -> optimizer.step() ->
scheduler.step(), repeated — and asserts the two frameworks stay on the
SAME trajectory: identical weights + identical batches give matching
per-step loss traces and matching final parameters after N updates.

That jointly pins the pieces no single-step test can: momentum-buffer
seeding, torch's L2-coupled weight decay ordering (grad += wd*p BEFORE
momentum), decoupled AdamW decay, the off-by-one between "LR used at step
t" and torch's post-step scheduler increments, and gradient parity through
the whole AVTh graph (GPT-2 core + encoder/decoder + teacher-forced feat
loss) rather than a stub model.

Reference surfaces exercised (imported from /root/reference):
  * models/future_prediction.py AVTh   (train-mode fwd+bwd)
  * loss_fn/multidim_xentropy.py       (cls loss on a linear head)
  * common/scheduler.py                (Warmup(CosineLR), WarmupMultiStepLR)
  * func/train.py iteration semantics  (step order, per-iter sched.step)
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

import ref_harness

from avt_tpu.losses import multidim_cross_entropy
from avt_tpu.models.future import AVTh
from avt_tpu.models.import_torch import avt_checkpoint_to_flax, merge_params
from avt_tpu.losses.mse import normed_mse
from avt_tpu.train.optim import build_optimizer

ref_sched = ref_harness.import_ref("common.scheduler")
ref_xent = ref_harness.import_ref("loss_fn.multidim_xentropy")
ref_future = ref_harness.import_ref("models.future_prediction")

RNG = np.random.default_rng(21)

B, T, IN_F, INTER, N_LAYER, N_HEAD, N_CLS = 4, 6, 24, 32, 2, 2, 7
N_STEPS = 8
IPE = 4  # iters per "epoch" for the schedulers
FEAT_WT = 0.5


def _make_models():
    """Reference AVTh + torch linear head, and the avt_tpu AVTh with the
    reference's weights converted in. Dropout 0 so train-mode forwards are
    deterministic and the two rollout styles (KV-cache vs recompute) agree."""
    torch.manual_seed(11)
    ref = ref_future.AVTh(
        in_features=IN_F, inter_dim=INTER, output_len=1, avg_last_n=1,
        future_pred_loss={"_target_": "loss_fn.mse.NormedMSE"},
        n_layer=N_LAYER, n_head=N_HEAD,
        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
    ).train()
    head = torch.nn.Linear(IN_F, N_CLS)
    sd = {
        # .copy(): .numpy() views torch storage, and the torch trajectory
        # later mutates those params in place via optimizer steps
        f"future_predictor.{k}": v.detach().numpy().copy()
        for k, v in ref.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    converted = avt_checkpoint_to_flax(sd)

    model = AVTh(
        in_features=IN_F, inter_dim=INTER, n_layer=N_LAYER, n_head=N_HEAD,
        output_len=1, avg_last_n=1,
        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
        future_pred_loss=lambda p, t: normed_mse(p, t, reduction="none"),
    )
    feats0 = jnp.zeros((B, T, IN_F), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), feats0)
    params = {
        "avth": merge_params(init["params"], converted["future_predictor"]),
        "head": {
            # .copy(): jnp.asarray on the CPU backend may alias the numpy
            # buffer, which views torch storage mutated by the torch loop
            "kernel": jnp.asarray(head.weight.detach().numpy().T.copy()),
            "bias": jnp.asarray(head.bias.detach().numpy().copy()),
        },
    }
    return ref, head, model, params


def _make_batches():
    feats = RNG.normal(size=(N_STEPS, B, T, IN_F)).astype(np.float32)
    labels = RNG.integers(0, N_CLS, size=(N_STEPS, B))
    return feats, labels


def _torch_trajectory(ref, head, feats, labels, make_opt_sched):
    opt, sched = make_opt_sched(
        list(ref.parameters()) + list(head.parameters()))
    ref_ce = ref_xent.MultiDimCrossEntropy(ignore_index=-1, reduction="mean")
    trace = []
    for i in range(N_STEPS):
        opt.zero_grad()
        _, final, losses, _ = ref(torch.from_numpy(feats[i]),
                                  target_shape=(B,))
        logits = head(final)
        total = (ref_ce(logits, torch.from_numpy(labels[i]))
                 + FEAT_WT * losses["feat"].mean())
        total.backward()
        opt.step()
        sched.step()  # per-iteration, func/train.py:261-265
        trace.append(float(total.detach()))
    params = {
        **{k: v.detach().numpy() for k, v in ref.state_dict().items()
           if not k.endswith(".attn.bias")
           and not k.endswith(".attn.masked_bias")},
        "head.weight": head.weight.detach().numpy(),
        "head.bias": head.bias.detach().numpy(),
    }
    return np.asarray(trace), params


def _avt_trajectory(model, params, feats, labels, tx):
    def loss_fn(p, fr, lb):
        _, final, losses, _ = model.apply(
            {"params": p["avth"]}, fr, (B,), train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},  # pdrop=0: unused
        )
        logits = final @ p["head"]["kernel"] + p["head"]["bias"]
        cls = multidim_cross_entropy(logits, lb, reduction="mean")
        return cls + FEAT_WT * jnp.mean(losses["feat"])

    step = jax.jit(jax.value_and_grad(loss_fn))
    opt_state = tx.init(params)
    trace = []
    for i in range(N_STEPS):
        loss, grads = step(params, jnp.asarray(feats[i]),
                           jnp.asarray(labels[i]))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        trace.append(float(loss))
    return np.asarray(trace), params


def _assert_params_close(avt_params, torch_params, rtol=2e-3, atol=2e-5):
    """Compare the jax param tree against the torch state dict by running
    the final torch weights through the same converter used for init —
    identical tree paths, so a plain path-keyed comparison works."""
    sd = {f"future_predictor.{k}": v for k, v in torch_params.items()
          if not k.startswith("head.")}
    want_avth = avt_checkpoint_to_flax(sd)["future_predictor"]
    got_flat = dict(
        jax.tree_util.tree_flatten_with_path(avt_params["avth"])[0])
    want_flat = jax.tree_util.tree_flatten_with_path(want_avth)[0]
    # the converted tree holds exactly the reference's trainable params;
    # every one of them must have tracked the torch trajectory
    assert want_flat, "empty converted tree"
    for path, want in want_flat:
        np.testing.assert_allclose(
            np.asarray(got_flat[path]), np.asarray(want),
            rtol=rtol, atol=atol,
            err_msg=f"param {jax.tree_util.keystr(path)} diverged",
        )
    np.testing.assert_allclose(
        np.asarray(avt_params["head"]["kernel"]),
        torch_params["head.weight"].T, rtol=rtol, atol=atol)
    np.testing.assert_allclose(
        np.asarray(avt_params["head"]["bias"]),
        torch_params["head.bias"], rtol=rtol, atol=atol)


def test_sgd_cosine_trajectory_vs_reference():
    """expts/01 flagship combination: nesterov SGD, L2-coupled wd,
    warmup-wrapped cosine stepped every iteration."""
    base_lr, wd, eta_min = 0.05, 5e-3, 1e-5
    ref, head, model, params = _make_models()
    feats, labels = _make_batches()

    def make_opt_sched(torch_params):
        opt = torch.optim.SGD(torch_params, lr=base_lr, momentum=0.9,
                              weight_decay=wd, nesterov=True)
        base = ref_sched.CosineLR(opt, num_epochs=2, iters_per_epoch=IPE,
                                  world_size=1, eta_min=eta_min)
        sched = ref_sched.Warmup(opt, scheduler=base, init_lr_ratio=0.1,
                                 num_epochs=1, iters_per_epoch=IPE)
        return opt, sched

    want_trace, want_params = _torch_trajectory(
        ref, head, feats, labels, make_opt_sched)

    tx, _ = build_optimizer(
        params, [["__all__", base_lr, wd]],
        optimizer_name="sgd", scheduler_name="cosine",
        iters_per_epoch=IPE, num_epochs=3, warmup_epochs=1,
        warmup_init_lr_ratio=0.1,
        optimizer_kwargs={"nesterov": True},
        scheduler_kwargs={"eta_min": eta_min},
    )
    got_trace, got_params = _avt_trajectory(model, params, feats, labels, tx)
    np.testing.assert_allclose(got_trace, want_trace, rtol=5e-4, atol=1e-5)
    _assert_params_close(got_params, want_params)


def test_adamw_multistep_trajectory_vs_reference():
    """AdamW (decoupled decay, bias-corrected moments) under the
    WarmupMultiStepLR schedule (its own internal warmup, no outer wrap)."""
    base_lr, wd = 1e-3, 1e-2
    ref, head, model, params = _make_models()
    feats, labels = _make_batches()

    def make_opt_sched(torch_params):
        opt = torch.optim.AdamW(torch_params, lr=base_lr, weight_decay=wd)
        base = ref_sched.WarmupMultiStepLR(
            opt, milestone_epochs=[1], gamma=0.1, warmup_factor=1.0 / 3,
            warmup_epochs=1, iters_per_epoch=IPE, world_size=1)
        # the reference ALWAYS wraps with Warmup (conf/config.yaml:128);
        # num_epochs=0 degenerates to one full-base-lr iteration before the
        # base scheduler takes over — build_schedule replicates that
        sched = ref_sched.Warmup(opt, scheduler=base, init_lr_ratio=0.0,
                                 num_epochs=0, iters_per_epoch=IPE)
        return opt, sched

    want_trace, want_params = _torch_trajectory(
        ref, head, feats, labels, make_opt_sched)

    tx, _ = build_optimizer(
        params, [["__all__", base_lr, wd]],
        optimizer_name="adamw", scheduler_name="warmup_multi_step",
        iters_per_epoch=IPE, num_epochs=3, warmup_epochs=0,
        scheduler_kwargs={
            "milestone_epochs": [1], "gamma": 0.1,
            "warmup_factor": 1.0 / 3, "scheduler_warmup_epochs": 1,
        },
    )
    got_trace, got_params = _avt_trajectory(model, params, feats, labels, tx)
    np.testing.assert_allclose(got_trace, want_trace, rtol=5e-4, atol=1e-5)
    _assert_params_close(got_params, want_params)


def test_adafactor_trajectory_vs_reference():
    """The reference's adafactor is transformers.Adafactor instantiated
    with per-group lr dicts (func/train.py:744), which bypasses the
    manual-lr check — so with the default relative_step=True the
    configured LR and every scheduler step are IGNORED: effective lr =
    min(1e-2, 1/sqrt(t)) * max(1e-3, RMS(param)), and weight decay is
    decoupled scaled by that same lr. The torch side below steps a wrapped
    cosine scheduler anyway, proving both frameworks ignore it alike."""
    import transformers

    base_lr, wd = 0.05, 1e-2
    ref, head, model, params = _make_models()
    feats, labels = _make_batches()

    def make_opt_sched(torch_params):
        opt = transformers.Adafactor(
            [{"params": torch_params, "lr": base_lr, "weight_decay": wd}])
        base = ref_sched.CosineLR(opt, num_epochs=2, iters_per_epoch=IPE,
                                  world_size=1, eta_min=0.0)
        sched = ref_sched.Warmup(opt, scheduler=base, init_lr_ratio=0.1,
                                 num_epochs=1, iters_per_epoch=IPE)
        return opt, sched

    want_trace, want_params = _torch_trajectory(
        ref, head, feats, labels, make_opt_sched)

    tx, _ = build_optimizer(
        params, [["__all__", base_lr, wd]],
        optimizer_name="adafactor", scheduler_name="cosine",
        iters_per_epoch=IPE, num_epochs=3, warmup_epochs=1,
        warmup_init_lr_ratio=0.1,
    )
    got_trace, got_params = _avt_trajectory(model, params, feats, labels, tx)
    np.testing.assert_allclose(got_trace, want_trace, rtol=5e-4, atol=1e-5)
    # adafactor's first step is sign-like (beta2t(1)=0 => update = g/|g|):
    # gradient elements at float-noise level flip sign between frameworks,
    # each flip costing ~2*lr on that element — atol reflects that noise
    # floor; the exact update rule is pinned bit-tight on controlled
    # gradients in test_adafactor_update_rule_vs_transformers
    _assert_params_close(got_params, want_params, atol=4e-4)


def test_adafactor_update_rule_vs_transformers():
    """Bit-tight differential of the adafactor update rule itself on
    CONTROLLED gradients (no model noise): factored (2D) and unfactored
    (1D/scalar) params, relative-step lr, RMS parameter scale, clip
    threshold, decoupled lr-scaled weight decay — 5 steps, rtol 1e-6."""
    import transformers

    from avt_tpu.train.optim import transformers_adafactor

    rng = np.random.default_rng(3)
    init = {
        "w": rng.normal(size=(8, 6)).astype(np.float32) * 0.3,
        "b": rng.normal(size=(5,)).astype(np.float32) * 0.01,
        "s": np.asarray(0.7, np.float32),
    }
    grads = [
        {k: rng.normal(size=v.shape).astype(np.float32)
         for k, v in init.items()}
        for _ in range(5)
    ]
    wd = 1e-2

    # torch side, exactly as func/train.py builds it: per-group lr dicts
    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
               for k, v in init.items()}
    opt = transformers.Adafactor(
        [{"params": list(tparams.values()), "lr": 0.123,
          "weight_decay": wd}])
    for g in grads:
        opt.zero_grad()
        for k in tparams:
            tparams[k].grad = torch.from_numpy(g[k].copy())
        opt.step()

    tx = transformers_adafactor(lambda it: 0.123, weight_decay=wd)
    params = {k: jnp.asarray(v) for k, v in init.items()}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(
            {k: jnp.asarray(v) for k, v in g.items()}, state, params)
        params = optax.apply_updates(params, updates)
    for k in init:
        np.testing.assert_allclose(
            np.asarray(params[k]), tparams[k].detach().numpy(),
            rtol=1e-6, atol=1e-7, err_msg=f"param {k}")


def test_grad_clip_with_frozen_group_vs_reference_semantics():
    """func/train.py:225-231 clips the global grad norm over the params
    being OPTIMIZED only (lr==0 groups had requires_grad turned off at
    :736-742, so they contribute neither gradients nor norm mass).
    build_optimizer zeroes frozen grads before optax.clip_by_global_norm —
    assert the two give identical multi-step SGD trajectories, with frozen
    params frozen."""
    rng = np.random.default_rng(5)
    init = {
        "feat": {"kernel": rng.normal(size=(6, 8)).astype(np.float32)},
        "frozen": {"kernel": rng.normal(size=(4, 4)).astype(np.float32)},
    }
    # large grads so the clip (max_norm=1) is active every step
    grads = [
        {k: {"kernel": rng.normal(size=v["kernel"].shape)
             .astype(np.float32) * 3}
         for k, v in init.items()}
        for _ in range(4)
    ]
    lr, wd, max_norm = 0.1, 1e-2, 1.0

    # --- torch, the reference way
    t_feat = torch.nn.Parameter(torch.from_numpy(init["feat"]["kernel"].copy()))
    t_frozen = torch.nn.Parameter(
        torch.from_numpy(init["frozen"]["kernel"].copy()))
    t_frozen.requires_grad = False
    opt = torch.optim.SGD([t_feat], lr=lr, momentum=0.9, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        t_feat.grad = torch.from_numpy(g["feat"]["kernel"].copy())
        torch.nn.utils.clip_grad_norm_([t_feat], max_norm=max_norm)
        opt.step()

    # --- avt_tpu
    params = jax.tree.map(jnp.asarray, init)
    tx, _ = build_optimizer(
        params, [["frozen", 0.0, 0.0], ["__all__", lr, wd]],
        optimizer_name="sgd", scheduler_name="constant",
        iters_per_epoch=10, num_epochs=10, grad_clip_max_norm=max_norm,
    )
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(
            jax.tree.map(jnp.asarray, g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["feat"]["kernel"]), t_feat.detach().numpy(),
        rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(params["frozen"]["kernel"]), init["frozen"]["kernel"],
        rtol=0, atol=0, err_msg="frozen group moved")


class _AttrDict(dict):
    """Minimal OmegaConf stand-in: attribute get/set over nested dicts."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


@pytest.mark.parametrize("variant", ["past_nce", "maps_nce"])
def test_full_composition_sgd_trajectory_vs_reference(variant):
    """Multi-step trajectory of the FULL composition — identity backbone ->
    agg -> clip unfold -> AVTh -> heads (past-classifier + NCE project MLP
    + regression head, or cls-mapping marginalization + NCE), Basic-op
    losses weighted per func/train.py:207-217 — trained 6 steps with
    nesterov SGD + L2 weight decay under a warmup-wrapped per-iteration
    cosine, against torch.optim stepping the reference BaseModel from the
    same weights and batches. Pins the per-step loss trace and EVERY final
    parameter leaf-for-leaf: the one-step differential
    (test_diff_reference.test_full_composition_grads_vs_reference) catches
    wrong gradients; this additionally catches optimizer/scheduler coupling
    errors interacting with the composed graph over time.

    classifier_on_past cannot combine with use_cls_mappings: the REFERENCE
    crashes there (torch.mm on the 3-D past features,
    models/base_model.py:236 'self must be a matrix'), so the two maximal
    variants are tested separately — same split its shipped configs imply.
    Reference: models/base_model.py:140-273, func/train_eval_ops.py:45-145,
    func/train.py:207-231,261-265."""
    use_maps = variant == "maps_nce"
    on_past = variant == "past_nce"
    from avt_tpu.models import (
        AVTModel,
        IdentityAgg,
        IdentityBackbone,
        LinearClassifier,
    )
    from avt_tpu.train.ops import basic_loss_accuracy
    from avt_tpu.train.step import weighted_loss_sum

    ref_bm = ref_harness.import_ref("models.base_model")
    ref_ops = ref_harness.import_ref("func.train_eval_ops")
    ref_mse = ref_harness.import_ref("loss_fn.mse")

    B2, clips, crops, C = 2, 6, 2, 24
    n_act, n_verb, inter, nl, nh, steps = 6, 3, 32, 2, 2, 6
    base_lr, wd, eta_min = 0.05, 5e-3, 1e-5
    cfg = _AttrDict(
        backbone={"_target_": "torch.nn.Identity"},
        backbone_last_n_modules_to_drop=0,
        backbone_dim=C,
        intermediate_featdim=None,
        temporal_aggregator={"_target_": "models.temporal_aggregation.Identity"},
        same_temp_agg_dim=False,
        future_predictor={
            "_target_": "models.future_prediction.AVTh",
            "output_len": 1, "avg_last_n": 1, "return_past_too": True,
            "inter_dim": inter, "n_layer": nl, "n_head": nh,
            "future_pred_loss": {"_target_": "loss_fn.mse.NormedMSE"},
        },
        project_dim_for_nce=16,
        temporal_aggregator_after_future_pred={
            "_target_": "models.temporal_aggregation.Identity"
        },
        dropout=0.0,
        use_cls_mappings=use_maps,
        classifier={"_target_": "torch.nn.Linear"},
        add_regression_head=True,
        classifier_on_past=on_past,
        bn=_AttrDict(eps=1e-5, mom=0.1),
    )
    via = np.zeros((n_act, n_verb), np.float32)
    for a in range(n_act):
        via[a, a % n_verb] = 1.0
    torch.manual_seed(29)
    ref = ref_bm.BaseModel(
        cfg,
        num_classes={"action": n_act, "verb": n_verb},
        class_mappings={("verb", "action"): torch.from_numpy(via)},
    ).eval()
    sd0 = {
        k: v.detach().numpy().copy() for k, v in ref.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    converted = avt_checkpoint_to_flax(sd0)

    classifiers = {"action": LinearClassifier(out_features=n_act)}
    if not use_maps:
        classifiers["verb"] = LinearClassifier(out_features=n_verb)
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=C),
        future_predictor=AVTh(
            in_features=C, inter_dim=inter, n_layer=nl, n_head=nh,
            output_len=1, avg_last_n=1, return_past_too=True,
            embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
            future_pred_loss=lambda p, t: normed_mse(p, t, reduction="none"),
        ),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=C),
        classifiers=classifiers,
        num_classes=(("action", n_act), ("verb", n_verb)),
        class_mappings=((("verb", "action"), via),),
        backbone_dim=C,
        dropout=0.0,
        use_cls_mappings=use_maps,
        classifier_on_past=on_past,
        project_dim_for_nce=16,
        add_regression_head=True,
    )

    videos = RNG.normal(
        size=(steps, B2, clips, crops, C, 1, 1, 1)).astype(np.float32)
    acts = RNG.integers(0, n_act, size=(steps, B2))
    verbs = RNG.integers(-1, n_verb, size=(steps, B2))  # incl. ignore rows
    sub_a = RNG.integers(-1, n_act, size=(steps, B2, clips, 3))
    sub_v = RNG.integers(-1, n_verb, size=(steps, B2, clips, 3))
    fut_tgt = RNG.normal(size=(steps, B2, clips, 16)).astype(np.float32)
    loss_wts = {
        "cls_action": 1.0, "cls_verb": 0.4, "feat": 0.8,
        "reg": 0.7, "regm": 0.5,
    }
    if on_past:
        loss_wts.update({"past_cls_action": 0.6, "past_cls_verb": 0.3})
    subs_t = lambda i: (  # noqa: E731
        {"action": torch.from_numpy(sub_a[i]),
         "verb": torch.from_numpy(sub_v[i])} if on_past else None
    )
    subs_j = lambda i: (  # noqa: E731
        {"action": jnp.asarray(sub_a[i]), "verb": jnp.asarray(sub_v[i])}
        if on_past else None
    )

    # ---- torch trajectory
    opt = torch.optim.SGD(ref.parameters(), lr=base_lr, momentum=0.9,
                          weight_decay=wd, nesterov=True)
    base = ref_sched.CosineLR(opt, num_epochs=2, iters_per_epoch=IPE,
                              world_size=1, eta_min=eta_min)
    sched = ref_sched.Warmup(opt, scheduler=base, init_lr_ratio=0.1,
                             num_epochs=1, iters_per_epoch=IPE)
    ref_loss_fn = ref_ops.BasicLossAccuracy(dataset=None, device="cpu")
    want_trace = []
    for i in range(steps):
        opt.zero_grad()
        t_out, t_aux = ref(torch.from_numpy(videos[i]), target_shape=(B2,))
        t_losses, _ = ref_loss_fn(
            t_out,
            {"action": torch.from_numpy(acts[i]),
             "verb": torch.from_numpy(verbs[i])},
            subs_t(i),
        )
        t_losses.update(t_aux)
        t_losses["reg"] = ref_mse.NormedMSE(reduction="none")(
            t_out["future_projected"], torch.from_numpy(fut_tgt[i]))
        t_losses["regm"] = t_out["logits_regression"].pow(2)
        total = sum(loss_wts[k] * v.mean() for k, v in t_losses.items())
        total.backward()
        opt.step()
        sched.step()
        want_trace.append(float(total.detach()))
    grad_style = {
        name: prm.detach().numpy() for name, prm in ref.named_parameters()
    }
    want_params = avt_checkpoint_to_flax(grad_style)

    # ---- avt trajectory from the same weights/batches
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(videos[0]), (B2,))
    params = merge_params(init["params"], converted)
    tx, _ = build_optimizer(
        params, [["__all__", base_lr, wd]],
        optimizer_name="sgd", scheduler_name="cosine",
        iters_per_epoch=IPE, num_epochs=3, warmup_epochs=1,
        warmup_init_lr_ratio=0.1,
        optimizer_kwargs={"nesterov": True},
        scheduler_kwargs={"eta_min": eta_min},
    )

    def loss_fn(p, vid, act, vrb, sa, sv, ft):
        outputs, aux = model.apply({"params": p}, vid, (B2,))
        losses, _ = basic_loss_accuracy(
            outputs, {"action": act, "verb": vrb},
            {"action": sa, "verb": sv} if on_past else None,
            num_classes={"action": n_act, "verb": n_verb},
        )
        losses.update(aux)
        losses["reg"] = normed_mse(
            outputs["future_projected"], ft, reduction="none")
        losses["regm"] = outputs["logits_regression"] ** 2
        total, _ = weighted_loss_sum(losses, {k: loss_wts[k] for k in losses})
        return total

    step = jax.jit(jax.value_and_grad(loss_fn))
    opt_state = tx.init(params)
    got_trace = []
    for i in range(steps):
        loss, grads = step(
            params, jnp.asarray(videos[i]), jnp.asarray(acts[i]),
            jnp.asarray(verbs[i]), jnp.asarray(sub_a[i]),
            jnp.asarray(sub_v[i]), jnp.asarray(fut_tgt[i]),
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        got_trace.append(float(loss))
    np.testing.assert_allclose(
        got_trace, want_trace, rtol=5e-4, atol=1e-5)

    # leaf-for-leaf final params, asserting every leaf was compared
    def walk(want, got, path=""):
        n = 0
        for key, val in want.items():
            assert key in got, f"missing subtree {path}{key}"
            if isinstance(val, dict):
                n += walk(val, got[key], path + key + "/")
            else:
                np.testing.assert_allclose(
                    np.asarray(got[key]), np.asarray(val),
                    rtol=2e-3, atol=2e-5, err_msg=f"param {path}{key}",
                )
                n += 1
        return n

    def count(tree):
        return sum(
            count(v) if isinstance(v, dict) else 1 for v in tree.values())

    compared = walk(want_params, params)
    assert compared == count(params), (
        f"compared {compared} of {count(params)} leaves")
