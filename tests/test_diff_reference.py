"""Differential parity tests against the ACTUAL reference source.

Every test here imports the genuine modules from /root/reference (via
tests/ref_harness.py stubs) and asserts avt_tpu == reference on randomized
inputs. This is the ground-truth layer the round-1 suite lacked: parity
pinned to the reference's own code, not to reconstructions of it.

Surfaces covered (per VERDICT.md round-1 "Next round" item 1):
  * loss_fn/multidim_xentropy.py  (MultiDimCrossEntropy, QuantizeAndCrossEntropy)
  * loss_fn/mse.py                (NormedMSE)
  * loss_fn/simclr_infonce.py     (MIL CE + single-replica SimCLR InfoNCE)
  * common/scheduler.py           (all four schedulers, per-iter LR traces)
  * func/train_eval_ops.py        (BasicLossAccuracy incl. past losses)
  * models/future_prediction.py   (AVTh, output_len 1 and 3, converted weights)
  * datasets/base_video_dataset.py (convert_to_anticipation, _sample)
"""
import numpy as np
import pandas as pd
import pytest
import torch

import jax.numpy as jnp

import ref_harness

from avt_tpu.losses import (
    mil_cross_entropy,
    multidim_cross_entropy,
    normed_mse,
    quantize_and_cross_entropy,
    simclr_infonce,
)
from avt_tpu.train.optim import (
    PlateauScaleState,
    ReduceLROnPlateau,
    build_schedule,
    cosine_schedule,
    multistep_schedule,
)
from avt_tpu.train.ops import basic_loss_accuracy

ref_xent = ref_harness.import_ref("loss_fn.multidim_xentropy")
ref_mse = ref_harness.import_ref("loss_fn.mse")
ref_nce = ref_harness.import_ref("loss_fn.simclr_infonce")
ref_sched = ref_harness.import_ref("common.scheduler")
ref_ops = ref_harness.import_ref("func.train_eval_ops")
ref_future = ref_harness.import_ref("models.future_prediction")
ref_bvd = ref_harness.import_ref("datasets.base_video_dataset")

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------- losses
@pytest.mark.parametrize("shape", [(8, 12), (4, 5, 12)])
@pytest.mark.parametrize("reduction", ["none", "mean"])
def test_multidim_cross_entropy_vs_reference(shape, reduction):
    logits = RNG.normal(size=shape).astype(np.float32)
    tgt = RNG.integers(0, shape[-1], size=shape[:-1])
    tgt.reshape(-1)[::3] = -1  # sprinkle ignored entries
    ref_fn = ref_xent.MultiDimCrossEntropy(ignore_index=-1, reduction=reduction)
    want = ref_fn(torch.from_numpy(logits), torch.from_numpy(tgt)).numpy()
    got = multidim_cross_entropy(
        jnp.asarray(logits), jnp.asarray(tgt), reduction=reduction
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_multidim_cross_entropy_weighted_vs_reference():
    logits = RNG.normal(size=(6, 9)).astype(np.float32)
    tgt = RNG.integers(0, 9, size=(6,))
    tgt[1] = -1
    w = RNG.uniform(0.5, 3.0, size=(9,)).astype(np.float32)
    for reduction in ("none", "mean"):
        ref_fn = ref_xent.MultiDimCrossEntropy(
            ignore_index=-1, reduction=reduction, weight=torch.from_numpy(w)
        )
        want = ref_fn(torch.from_numpy(logits), torch.from_numpy(tgt)).numpy()
        got = multidim_cross_entropy(
            jnp.asarray(logits), jnp.asarray(tgt), weight=jnp.asarray(w),
            reduction=reduction,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_quantize_and_cross_entropy_vs_reference(tmp_path):
    C, K = 16, 12
    centroids = RNG.normal(size=(K, C)).astype(np.float32)
    fpath = tmp_path / "centroids.pth"
    torch.save({"weight": torch.from_numpy(centroids)}, fpath)
    inp = RNG.normal(size=(3, 5, C)).astype(np.float32)
    tgt = RNG.normal(size=(3, 5, C)).astype(np.float32)
    ref_fn = ref_xent.QuantizeAndCrossEntropy(
        str(fpath), reduction="none", ignore_index=-1
    )
    # Reference bug: forward() reads `self.centroids` but the buffer lives on
    # `self.assigner` (loss_fn/multidim_xentropy.py:44-48 vs common/cluster.py
    # :13-14), so the class crashes as shipped. Patch in the obvious intent
    # so the math itself can be diffed.
    ref_fn.centroids = ref_fn.assigner.centroids
    want = ref_fn(torch.from_numpy(inp), torch.from_numpy(tgt)).numpy()
    got = quantize_and_cross_entropy(
        jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(centroids),
        reduction="none",
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduction", ["none", "mean"])
def test_normed_mse_vs_reference(reduction):
    inp = RNG.normal(size=(4, 6, 10)).astype(np.float32)
    tgt = RNG.normal(size=(4, 6, 10)).astype(np.float32)
    ref_fn = ref_mse.NormedMSE(reduction=reduction)
    want = ref_fn(torch.from_numpy(inp), torch.from_numpy(tgt)).numpy()
    got = normed_mse(jnp.asarray(inp), jnp.asarray(tgt), reduction=reduction)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mil_type", ["sum", "max"])
def test_mil_cross_entropy_vs_reference(mil_type):
    B, N, K = 5, 14, 2  # exactly K positives per row (reference reshape needs it)
    pred = RNG.normal(size=(B, N)).astype(np.float32)
    onehot = np.zeros((B, N), dtype=np.float32)
    for b in range(B):
        onehot[b, RNG.choice(N, size=K, replace=False)] = 1.0
    ref_fn = ref_nce.MILCrossEntropyLoss(mil_type=mil_type)
    want = ref_fn(torch.from_numpy(pred), torch.from_numpy(onehot)).numpy()
    got = mil_cross_entropy(
        jnp.asarray(pred), jnp.asarray(onehot), mil_type=mil_type
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("target_ndim,t2o,mil_type", [
    (2, True, "sum"),
    (2, False, "sum"),
    (3, True, "sum"),
    (3, True, "max"),
])
def test_simclr_infonce_vs_reference(target_ndim, t2o, mil_type):
    B, C, K = 6, 12, 3
    out = RNG.normal(size=(B, C)).astype(np.float32)
    tgt_shape = (B, C) if target_ndim == 2 else (B, K, C)
    tgt = RNG.normal(size=tgt_shape).astype(np.float32)
    ref_fn = ref_nce.DistributedSimclrInfoNCELoss(
        temperature=0.1, target_to_output_loss=t2o, mil_type=mil_type
    )
    want = ref_fn(torch.from_numpy(out), torch.from_numpy(tgt)).numpy()
    got = simclr_infonce(
        jnp.asarray(out), jnp.asarray(tgt), temperature=0.1,
        target_to_output_loss=t2o, mil_type=mil_type, axis_name=None,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ schedulers
def _torch_lr_trace(make_sched, base_lr, n_iters):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = make_sched(opt)
    lrs = []
    for _ in range(n_iters):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(lrs)


def test_warmup_multistep_lr_trace_vs_reference():
    base_lr, ipe = 0.02, 5
    want = _torch_lr_trace(
        lambda opt: ref_sched.WarmupMultiStepLR(
            opt, milestone_epochs=[4, 8], gamma=0.1, warmup_factor=1.0 / 3,
            warmup_epochs=2, iters_per_epoch=ipe, world_size=2,
        ),
        base_lr, 60,
    )
    fn = multistep_schedule(
        base_lr, [4, 8], ipe, gamma=0.1, warmup_factor=1.0 / 3, warmup_epochs=2
    )
    got = np.asarray([float(fn(i)) for i in range(60)])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_cosine_lr_trace_vs_reference():
    base_lr, ipe = 0.02, 5
    want = _torch_lr_trace(
        lambda opt: ref_sched.CosineLR(
            opt, num_epochs=6, iters_per_epoch=ipe, world_size=2, eta_min=1e-5
        ),
        base_lr, 40,  # runs past T_max=30 to hit the zero-LR branch
    )
    fn = cosine_schedule(base_lr, 6, ipe, eta_min=1e-5, world_size=2)
    got = np.asarray([float(fn(i)) for i in range(40)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


def test_warmup_wrapped_cosine_trace_vs_reference():
    base_lr, ipe, num_epochs, warmup_epochs = 0.02, 5, 8, 2

    def make(opt):
        # reference composition: cosine gets (num_epochs - warmup) via the
        # `minus` resolver (conf/opt/scheduler/cosine.yaml), warmup wraps it
        base = ref_sched.CosineLR(
            opt, num_epochs=num_epochs - warmup_epochs, iters_per_epoch=ipe,
            world_size=2, eta_min=1e-5,
        )
        return ref_sched.Warmup(
            opt, scheduler=base, init_lr_ratio=0.1, num_epochs=warmup_epochs,
            iters_per_epoch=ipe,
        )

    want = _torch_lr_trace(make, base_lr, 45)
    fn = build_schedule(
        "cosine", base_lr, iters_per_epoch=ipe, num_epochs=num_epochs,
        world_size=2, warmup_epochs=warmup_epochs, warmup_init_lr_ratio=0.1,
        eta_min=1e-5,
    )
    got = np.asarray([float(fn(i)) for i in range(45)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


def test_reduce_lr_on_plateau_trace_vs_reference():
    base_lr = 0.1
    metrics = [1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0]
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = ref_sched.ReduceLROnPlateau(
        opt, iters_per_epoch=5, world_size=2, mode="max", factor=0.5,
        patience=2,
    )
    mine = ReduceLROnPlateau(mode="max", factor=0.5, patience=2)
    state = PlateauScaleState(jnp.asarray(1.0), jnp.asarray(0.0))
    for m in metrics:
        sched.step(m)
        state = mine.step(state, m)
        assert float(state.mult) * base_lr == pytest.approx(
            opt.param_groups[0]["lr"], rel=1e-6
        )


# ----------------------------------------------------- BasicLossAccuracy
def test_basic_loss_accuracy_vs_reference():
    B, T, n_verb, n_noun = 6, 4, 13, 17
    outputs_np = {
        "logits/verb": RNG.normal(size=(B, n_verb)).astype(np.float32),
        "logits/noun": RNG.normal(size=(B, n_noun)).astype(np.float32),
        "past_logits/verb": RNG.normal(size=(B, 1, n_verb)).astype(np.float32),
    }
    target_np = {
        "verb": RNG.integers(0, n_verb, size=(B,)),
        "noun": RNG.integers(0, n_noun, size=(B,)),
    }
    target_np["noun"][2] = -1
    subclips_np = {
        "verb": RNG.integers(-1, n_verb, size=(B, 1, T)),
        "noun": RNG.integers(-1, n_noun, size=(B, 1, T)),
    }
    ref_fn = ref_ops.BasicLossAccuracy(dataset=None, device="cpu")
    want_losses, want_accs = ref_fn(
        {k: torch.from_numpy(v) for k, v in outputs_np.items()},
        {k: torch.from_numpy(v) for k, v in target_np.items()},
        {k: torch.from_numpy(v) for k, v in subclips_np.items()},
    )
    got_losses, got_accs = basic_loss_accuracy(
        {k: jnp.asarray(v) for k, v in outputs_np.items()},
        {k: jnp.asarray(v) for k, v in target_np.items()},
        {k: jnp.asarray(v) for k, v in subclips_np.items()},
        num_classes={"verb": n_verb, "noun": n_noun},
    )
    assert set(got_losses) == set(want_losses)
    assert set(got_accs) == set(want_accs)
    for k, v in want_losses.items():
        np.testing.assert_allclose(
            np.asarray(got_losses[k]), v.numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"loss {k}",
        )
    for k, v in want_accs.items():
        np.testing.assert_allclose(
            np.asarray(got_accs[k]), v.numpy(), rtol=1e-5, atol=1e-5,
            err_msg=f"accuracy {k}",
        )


def test_basic_loss_accuracy_dense_logits_vs_reference():
    """(B, T, C) dense-prediction logits path, incl. the all-ignored guard."""
    B, T, C = 3, 5, 8
    outputs_np = {"logits/action": RNG.normal(size=(B, T, C)).astype(np.float32)}
    target_np = {"action": np.full((B, T), -1, dtype=np.int64)}
    ref_fn = ref_ops.BasicLossAccuracy(dataset=None, device="cpu")
    want_losses, want_accs = ref_fn(
        {k: torch.from_numpy(v) for k, v in outputs_np.items()},
        {k: torch.from_numpy(v) for k, v in target_np.items()},
        None,
    )
    got_losses, got_accs = basic_loss_accuracy(
        {k: jnp.asarray(v) for k, v in outputs_np.items()},
        {k: jnp.asarray(v) for k, v in target_np.items()},
        None,
        num_classes={"action": C},
    )
    for k, v in want_losses.items():
        np.testing.assert_allclose(
            np.asarray(got_losses[k]), v.numpy(), rtol=1e-5, atol=1e-6
        )
    # all-targets-negative => reference short-circuits accuracies to 0
    for k, v in want_accs.items():
        np.testing.assert_allclose(np.asarray(got_accs[k]), v.numpy(), atol=1e-6)


# ------------------------------------------------------------------ AVTh
@pytest.mark.parametrize("output_len,avg_last_n,return_past", [
    (1, 1, True),    # the shipped expts/02 configuration
    (3, -1, False),  # multi-step rollout
])
def test_avth_vs_reference(output_len, avg_last_n, return_past):
    import jax
    from avt_tpu.models.future import AVTh
    from avt_tpu.models.import_torch import avt_checkpoint_to_flax, merge_params
    from avt_tpu.losses.mse import normed_mse

    in_features, inter_dim, n_layer, n_head = 24, 32, 2, 2
    torch.manual_seed(3)
    ref = ref_future.AVTh(
        in_features=in_features, inter_dim=inter_dim,
        output_len=output_len, avg_last_n=avg_last_n,
        return_past_too=return_past,
        future_pred_loss={"_target_": "loss_fn.mse.NormedMSE"},
        n_layer=n_layer, n_head=n_head,
    ).eval()
    sd = {
        f"future_predictor.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    converted = avt_checkpoint_to_flax(sd)

    model = AVTh(
        in_features=in_features, inter_dim=inter_dim,
        n_layer=n_layer, n_head=n_head,
        output_len=output_len, avg_last_n=avg_last_n,
        return_past_too=return_past,
        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
        future_pred_loss=lambda p, t: normed_mse(p, t, reduction="none"),
    )
    feats = RNG.normal(size=(2, 6, in_features)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    merged = merge_params(init["params"], converted["future_predictor"])
    past, final, losses, _ = model.apply({"params": merged}, jnp.asarray(feats))

    with torch.no_grad():
        t_past, t_final, t_losses, _ = ref(
            torch.from_numpy(feats), target_shape=(2,)
        )
    np.testing.assert_allclose(
        np.asarray(past), t_past.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(final), t_final.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(losses["feat"]), t_losses["feat"].numpy(),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("output_len", [1, 3])
def test_avth_gpt2_att_endpoints_vs_reference(output_len):
    """gpt2_att_<step> attention-map endpoints vs the reference AVTh run
    with output_attentions=True (future_prediction.py:184-188): per rollout
    step the HF model returns per-layer post-softmax probabilities which the
    reference stacks to (B, n_layer, n_head, Tq, Tk) — step 0 the full
    causal block, step k >= 1 the single new query over T0+k keys."""
    import jax
    from avt_tpu.models.future import AVTh
    from avt_tpu.models.import_torch import avt_checkpoint_to_flax, merge_params

    in_features, inter_dim, n_layer, n_head = 24, 32, 2, 2
    torch.manual_seed(11)
    ref = ref_future.AVTh(
        in_features=in_features, inter_dim=inter_dim,
        output_len=output_len, n_layer=n_layer, n_head=n_head,
        output_attentions=True,
    ).eval()
    # the reference pins transformers 4.2.2 (eager-only); the modern HF in
    # this env defaults to sdpa, whose attentions come back None — force the
    # eager path the reference actually ran with
    ref.gpt_model.config._attn_implementation = "eager"
    sd = {
        f"future_predictor.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    converted = avt_checkpoint_to_flax(sd)

    model = AVTh(
        in_features=in_features, inter_dim=inter_dim,
        n_layer=n_layer, n_head=n_head, output_len=output_len,
        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
        output_attentions=True,
    )
    feats = RNG.normal(size=(2, 6, in_features)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    merged = merge_params(init["params"], converted["future_predictor"])
    _past, final, _losses, endpoints = model.apply(
        {"params": merged}, jnp.asarray(feats)
    )
    with torch.no_grad():
        _t_past, t_final, _t_losses, t_endpoints = ref(
            torch.from_numpy(feats), target_shape=(2,)
        )
    assert sorted(endpoints) == sorted(t_endpoints) == [
        f"gpt2_att_{k}" for k in range(output_len)
    ]
    for k in range(output_len):
        want = t_endpoints[f"gpt2_att_{k}"].numpy()
        got = np.asarray(endpoints[f"gpt2_att_{k}"])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(final), t_final.numpy(), rtol=1e-4, atol=1e-4
    )


def test_avth_drop_last_n_and_output_len_eval_vs_reference():
    """Two remaining AVTh config edges: drop_last_n input truncation
    (future_prediction.py:151-158) and the eval-time output_len_eval
    override (:123-129) — eval mode picks output_len_eval=2 over
    output_len=1, rolling out one extra step."""
    import jax
    from avt_tpu.models.future import AVTh
    from avt_tpu.models.import_torch import avt_checkpoint_to_flax, merge_params
    from avt_tpu.losses.mse import normed_mse

    in_features, inter = 24, 32
    torch.manual_seed(9)
    ref = ref_future.AVTh(
        in_features=in_features, inter_dim=inter,
        output_len=1, output_len_eval=2, drop_last_n=2,
        future_pred_loss={"_target_": "loss_fn.mse.NormedMSE"},
        n_layer=2, n_head=2,
    ).eval()
    sd = {
        f"future_predictor.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    converted = avt_checkpoint_to_flax(sd)
    model = AVTh(
        in_features=in_features, inter_dim=inter, n_layer=2, n_head=2,
        output_len=1, output_len_eval=2, drop_last_n=2,
        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
        future_pred_loss=lambda p, t: normed_mse(p, t, reduction="none"),
    )
    feats = RNG.normal(size=(2, 7, in_features)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    merged = merge_params(init["params"], converted["future_predictor"])
    past, final, losses, _ = model.apply({"params": merged}, jnp.asarray(feats))
    with torch.no_grad():
        t_past, t_final, t_losses, _ = ref(
            torch.from_numpy(feats), target_shape=(2,))
    np.testing.assert_allclose(
        np.asarray(past), t_past.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(final), t_final.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(losses["feat"]), t_losses["feat"].numpy(),
        rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("output_len,quant_rollout", [(1, False), (2, True)])
def test_avth_quantized_ids_vs_reference(output_len, quant_rollout):
    """Quantized AVTh, cluster-id inputs (in_features=1): nn.Embedding
    encoder with the weight-tied decoder (future_prediction.py:77-87),
    hidden-state outputs, CE feat loss over cluster logits, and the
    argmax+re-encode rollout (quantize_before_rollout, :199-202)."""
    import jax
    from avt_tpu.models.future import AVTh
    from avt_tpu.models.import_torch import avt_checkpoint_to_flax, merge_params

    K, inter = 11, 32
    torch.manual_seed(5)
    ref = ref_future.AVTh(
        in_features=1, inter_dim=inter, output_len=output_len,
        num_cluster_centers=K, quantize_before_rollout=quant_rollout,
        future_pred_loss={
            "_target_": "loss_fn.multidim_xentropy.MultiDimCrossEntropy"},
        n_layer=2, n_head=2,
    ).eval()
    sd = {
        f"future_predictor.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    converted = avt_checkpoint_to_flax(sd)

    model = AVTh(
        in_features=1, inter_dim=inter, n_layer=2, n_head=2,
        output_len=output_len, num_cluster_centers=K,
        quantize_before_rollout=quant_rollout,
        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
        future_pred_loss=lambda p, t: multidim_cross_entropy(
            p, t, reduction="none"),
    )
    ids = RNG.integers(0, K, size=(2, 5, 1)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    merged = merge_params(init["params"], converted["future_predictor"])
    past, final, losses, _ = model.apply({"params": merged}, jnp.asarray(ids))
    with torch.no_grad():
        t_past, t_final, t_losses, _ = ref(
            torch.from_numpy(ids), target_shape=(2,))
    np.testing.assert_allclose(
        np.asarray(past), t_past.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(final), t_final.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(losses["feat"]), t_losses["feat"].numpy(),
        rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("output_len,quant_rollout", [(1, False), (2, True)])
def test_avth_assign_to_centroids_vs_reference(tmp_path, output_len,
                                               quant_rollout):
    """Quantized AVTh with on-the-fly centroid assignment of float features
    (assign_to_centroids, future_prediction.py:71-78,132-135,222-227):
    assignment ids feed the embedding encoder, predictions map back through
    the ORIGINAL kmeans centroid features, past feats stay the float input."""
    import jax
    from avt_tpu.models.future import AVTh
    from avt_tpu.models.import_torch import avt_checkpoint_to_flax, merge_params

    K, C, inter = 9, 12, 32
    centroids = RNG.normal(size=(K, C)).astype(np.float32) * 3.0
    fpath = tmp_path / "cent.pth"
    torch.save({"weight": torch.from_numpy(centroids)}, fpath)
    torch.manual_seed(7)
    ref = ref_future.AVTh(
        in_features=C, inter_dim=inter, output_len=output_len,
        assign_to_centroids=str(fpath), num_cluster_centers=K,
        quantize_before_rollout=quant_rollout,
        future_pred_loss={
            "_target_": "loss_fn.multidim_xentropy.MultiDimCrossEntropy"},
        n_layer=2, n_head=2,
    ).eval()
    sd = {
        f"future_predictor.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    converted = avt_checkpoint_to_flax(sd)

    model = AVTh(
        in_features=C, inter_dim=inter, n_layer=2, n_head=2,
        output_len=output_len, num_cluster_centers=K,
        centroids=centroids, quantize_before_rollout=quant_rollout,
        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
        future_pred_loss=lambda p, t: multidim_cross_entropy(
            p, t, reduction="none"),
    )
    # features = jittered centroid rows so both sides assign unambiguously
    rows = RNG.integers(0, K, size=(2, 5))
    feats = (centroids[rows] + 0.05 * RNG.normal(size=(2, 5, C))).astype(
        np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    merged = merge_params(init["params"], converted["future_predictor"])
    past, final, losses, _ = model.apply(
        {"params": merged}, jnp.asarray(feats))
    with torch.no_grad():
        t_past, t_final, t_losses, _ = ref(
            torch.from_numpy(feats), target_shape=(2,))
    np.testing.assert_allclose(
        np.asarray(past), t_past.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(final), t_final.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(losses["feat"]), t_losses["feat"].numpy(),
        rtol=1e-4, atol=1e-4)


# ----------------------------------------------- meters + in-loop accuracy
def test_smoothed_value_vs_reference():
    """SmoothedValue trace parity vs common/log.py:19-83: median is torch's
    lower-middle (not numpy's midpoint), global_avg divides by count+1e-6."""
    ref_log = ref_harness.import_ref("common.log")
    theirs = ref_log.SmoothedValue(window_size=4)
    from avt_tpu.train.meters import SmoothedValue

    ours = SmoothedValue(window_size=4)
    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.0]
    for i, v in enumerate(vals):
        theirs.update(v, n=i % 2 + 1)
        ours.update(v, n=i % 2 + 1)
        assert ours.median == pytest.approx(theirs.median), f"step {i}"
        assert ours.avg == pytest.approx(theirs.avg, rel=1e-6), f"step {i}"
        assert ours.global_avg == pytest.approx(theirs.global_avg), f"step {i}"
        assert ours.max == theirs.max and ours.value == theirs.value
    assert str(ours) == str(theirs)


@pytest.mark.parametrize("case", ["flat", "dense3d", "all_ignored", "some_ignored"])
def test_inloop_accuracy_vs_reference(case):
    """Train-loop top-k meter vs common/utils.py:17-44 `accuracy` — incl.
    the all-negative short-circuit and -1 targets counted in the
    denominator (they never match)."""
    ref_utils = ref_harness.import_ref("common.utils")
    from avt_tpu.utils.metrics import topk_accuracy

    if case == "flat":
        logits = RNG.normal(size=(16, 12)).astype(np.float32)
        targets = RNG.integers(0, 12, size=16)
    elif case == "dense3d":
        logits = RNG.normal(size=(4, 5, 12)).astype(np.float32)
        targets = RNG.integers(0, 12, size=(4, 5))
    elif case == "all_ignored":
        logits = RNG.normal(size=(8, 12)).astype(np.float32)
        targets = -np.ones((8,), dtype=np.int64)
    else:
        logits = RNG.normal(size=(16, 12)).astype(np.float32)
        targets = RNG.integers(0, 12, size=16)
        targets[::3] = -1
    want = ref_utils.accuracy(
        torch.from_numpy(logits), torch.from_numpy(np.asarray(targets)),
        topk=(1, 5),
    )
    got = topk_accuracy(jnp.asarray(logits), jnp.asarray(targets), topk=(1, 5))
    for g, w in zip(got, want):
        assert float(g) == pytest.approx(float(w), rel=1e-5), case


# ------------------------------------------- Transformer temporal aggregator
@pytest.mark.parametrize("agg_style", ["mean", "last"])
def test_transformer_agg_vs_reference(agg_style):
    """TransformerAgg vs the reference temporal_aggregation.Transformer
    (temporal_aggregation.py:73-147) with CONVERTED torch weights: pins the
    sincos positional encoding, the packed-qkv attention layout, the
    post-LN encoder-layer semantics, the final encoder LayerNorm, and the
    mean/last aggregation — eval mode (cloze masking is train-only rng)."""
    import jax
    from avt_tpu.models.import_torch import merge_params, transformer_agg_to_flax
    from avt_tpu.models.temporal_agg import TransformerAgg

    ref_ta = ref_harness.import_ref("models.temporal_aggregation")
    in_features, inter, heads, layers = 20, 16, 4, 2
    torch.manual_seed(7)
    ref = ref_ta.Transformer(
        in_features, inter_rep=inter, nheads=heads, nlayers=layers,
        agg_style=agg_style, cloze_loss_ratio=0.2, cloze_loss_wt=1.0,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = transformer_agg_to_flax(sd)

    model = TransformerAgg(
        in_features=in_features, inter_rep=inter, nheads=heads,
        nlayers=layers, agg_style=agg_style,
        cloze_loss_ratio=0.2, cloze_loss_wt=1.0,
    )
    feats = RNG.normal(size=(3, 9, in_features)).astype(np.float32)
    # init train=True so the [MASK] embedding param exists for merging
    init = model.init(
        {"params": jax.random.PRNGKey(0), "cloze": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        jnp.asarray(feats), train=True,
    )
    merged = merge_params(init["params"], converted)
    got, got_aux = model.apply({"params": merged}, jnp.asarray(feats))
    with torch.no_grad():
        want, want_aux = ref(torch.from_numpy(feats))
    assert got_aux == {} and want_aux == {}
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )


# -------------------------------------------------- annotation window math
def _annotations_df():
    n = 40
    start = RNG.uniform(0.0, 30.0, size=n)
    dur = RNG.uniform(0.2, 5.0, size=n)
    return pd.DataFrame({
        "uid": [f"uid_{i}" for i in range(n)],
        "video_path": ["v.mp4"] * n,
        "start": start,
        "end": start + dur,
        "action_class": RNG.integers(0, 10, size=n),
    })


@pytest.mark.parametrize("tau_a,tau_o,ratios,drop_style", [
    (1.0, 10.0, (1.0,), "correct"),
    (1.0, 10.0, (1.0,), "full_context_in"),
    (1.0, 10.0, (1.0,), "action_banks"),
    (0.25, 2.5, (0.5, 1.0), "correct"),
    (1.0, 5.0, (-999,), "correct"),
    (-999, 10.0, (1.0,), "correct"),  # recognition mode
])
def test_convert_to_anticipation_vs_reference(tau_a, tau_o, ratios, drop_style):
    from avt_tpu.data.anticipation import convert_to_anticipation

    df = _annotations_df()
    want_df, want_disc = ref_bvd.convert_to_anticipation(
        df.copy(), ["/root"], tau_a, tau_o,
        future_clip_ratios=list(ratios), drop_style=drop_style,
    )
    got_df, got_disc = convert_to_anticipation(
        df.copy(), tau_a, tau_o,
        future_clip_ratios=list(ratios), drop_style=drop_style,
    )
    assert list(got_df["uid"]) == list(want_df["uid"])
    assert sorted(got_disc["uid"]) == sorted(want_disc["uid"])
    cols = ["start", "end", "orig_start", "orig_end"] + [
        f"future_{i}_{w}" for i in range(len(ratios)) for w in ("start", "end")
    ]
    for col in cols:
        np.testing.assert_allclose(
            got_df[col].to_numpy(dtype=float),
            want_df[col].to_numpy(dtype=float),
            rtol=1e-9, err_msg=col,
        )


# ----------------------------------------------------- _sample index math
class _FakeReader:
    """Deterministic reader: frame at global index i has pixel value i%251.

    Emulates torchvision read_video's inclusive [start, end] pts selection so
    both pipelines consume identical frames.
    """

    def __init__(self, fps):
        self.fps = fps

    def n_range(self, start, end):
        first = int(np.ceil(start * self.fps - 1e-6))
        last = int(np.floor(end * self.fps + 1e-6))
        return first, max(last - first + 1, 0)

    def frames(self, start, end):
        first, n = self.n_range(start, end)
        idx = np.arange(first, first + n)
        return (idx[:, None, None, None] % 251).astype(np.uint8) * np.ones(
            (1, 2, 2, 3), dtype=np.uint8
        )

    # reference reader protocol: (video THWC, audio, info)
    def __call__(self, path, start, end, fps, df_row, pts_unit="sec"):
        return torch.from_numpy(self.frames(start, end)), None, {}


@pytest.mark.parametrize("strategy", [
    "random_clip", "center_clip", "last_clip", "first_clip",
])
@pytest.mark.parametrize("window,fps,frame_rate,fpc", [
    ((2.0, 6.0), 30.0, None, 16),    # crop path, no fps resample
    ((2.0, 6.0), 30.0, 4.0, 8),      # stride-8 resample
    ((2.0, 2.3), 30.0, None, 16),    # pad path (too few frames)
    ((-1.5, 0.8), 30.0, 4.0, 8),     # anticipation window before t=0
])
def test_sample_index_math_vs_reference(strategy, window, fps, frame_rate, fpc):
    from avt_tpu.data.sampling import compute_read_window, sample_clip_frames

    start, end = window
    reader = _FakeReader(fps)
    row = pd.Series({"uid": "u0"})
    want_video, want_sec, _, _, _ = ref_bvd.BaseVideoDataset._sample(
        "v.mp4", fps, start, end, row, fpc, frame_rate, strategy, reader,
        np.random.default_rng(11),
    )

    new_start, new_end, eff_fps = compute_read_window(
        start, end, fps, fpc, frame_rate, strategy, np.random.default_rng(11)
    )
    read = reader.frames(new_start, new_end)
    idx, secs = sample_clip_frames(
        read.shape[0], new_start, new_end, eff_fps, frame_rate, fpc, strategy
    )
    got_video = read[idx]

    np.testing.assert_array_equal(got_video, want_video.numpy())
    np.testing.assert_allclose(secs, want_sec.numpy(), rtol=1e-5, atol=1e-6)


# ------------------------------------------------- BaseModel composition
class _AttrDict(dict):
    """Minimal OmegaConf stand-in: attribute get/set over nested dicts."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


@pytest.mark.parametrize(
    "variant", ["past_classifier", "cls_mappings", "nce_regression"])
def test_base_model_composition_vs_reference(variant):
    """The FULL composition root diffed against the reference BaseModel
    (models/base_model.py), expts/02-style: identity backbone over feature
    subclips -> identity agg -> clip unfold -> AVTh, multi-crop averaged.
    Pins the endpoint dict contract (incl. the future_projected-is-past
    quirk) and the clips/crops folding semantics to the reference's own
    forward. Two variants because their combination is impossible UPSTREAM:
    'past_classifier' classifies every task on past+future feats;
    'cls_mappings' marginalizes verb from action logits (the reference's
    _apply_classifier torch.mm crashes on 3-D past logits, so no shipped
    config enables use_cls_mappings — conf/config.yaml:101 — let alone with
    classifier_on_past)."""
    import jax
    from avt_tpu.losses.mse import normed_mse
    from avt_tpu.models import (
        AVTh,
        AVTModel,
        IdentityAgg,
        IdentityBackbone,
        LinearClassifier,
    )
    from avt_tpu.models.import_torch import avt_checkpoint_to_flax, merge_params

    ref_bm = ref_harness.import_ref("models.base_model")

    B, clips, crops, C = 2, 10, 2, 24
    n_act, n_verb = 6, 3
    inter, n_layer, n_head = 32, 2, 2
    use_maps = variant == "cls_mappings"
    on_past = variant == "past_classifier"
    # NCE projection head (project_mlp on backbone_mean/temp_agg and the
    # future_projected-is-past quirk, base_model.py:161-164,180,209) +
    # regression head (:101-103) — the SSL-config surface
    nce = variant == "nce_regression"
    cfg = _AttrDict(
        backbone={"_target_": "torch.nn.Identity"},
        backbone_last_n_modules_to_drop=0,
        backbone_dim=C,
        intermediate_featdim=None,
        temporal_aggregator={
            "_target_": "models.temporal_aggregation.Identity"
        },
        same_temp_agg_dim=False,
        future_predictor={
            "_target_": "models.future_prediction.AVTh",
            "output_len": 1, "avg_last_n": 1, "return_past_too": True,
            "inter_dim": inter, "n_layer": n_layer, "n_head": n_head,
            "future_pred_loss": {"_target_": "loss_fn.mse.NormedMSE"},
        },
        project_dim_for_nce=16 if nce else None,
        temporal_aggregator_after_future_pred={
            "_target_": "models.temporal_aggregation.Identity"
        },
        dropout=0.0,
        use_cls_mappings=use_maps,
        classifier={"_target_": "torch.nn.Linear"},
        add_regression_head=nce,
        classifier_on_past=on_past,
        bn=_AttrDict(eps=1e-5, mom=0.1),
    )
    via = np.zeros((n_act, n_verb), np.float32)
    for a in range(n_act):
        via[a, a % n_verb] = 1.0
    torch.manual_seed(11)
    ref = ref_bm.BaseModel(
        cfg,
        num_classes={"action": n_act, "verb": n_verb},
        class_mappings={("verb", "action"): torch.from_numpy(via)},
    ).eval()

    sd = {
        k: v.detach().numpy() for k, v in ref.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    converted = avt_checkpoint_to_flax(sd)

    classifiers = {"action": LinearClassifier(out_features=n_act)}
    if not use_maps:
        classifiers["verb"] = LinearClassifier(out_features=n_verb)
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=C),
        future_predictor=AVTh(
            in_features=C, inter_dim=inter, n_layer=n_layer, n_head=n_head,
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
        project_dim_for_nce=16 if nce else None,
        add_regression_head=nce,
    )
    video = RNG.normal(size=(B, clips, crops, C, 1, 1, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video), (B,))
    merged = merge_params(params["params"], converted)
    outputs, aux = model.apply(
        {"params": merged}, jnp.asarray(video), (B,)
    )
    with torch.no_grad():
        want_out, want_aux = ref(
            torch.from_numpy(video), target_shape=(B,)
        )
    assert set(outputs) == set(want_out), (
        sorted(outputs), sorted(want_out)
    )
    for k, v in want_out.items():
        np.testing.assert_allclose(
            np.asarray(outputs[k]), v.numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"endpoint {k}",
        )
    assert set(aux) == set(want_aux)
    for k, v in want_aux.items():
        np.testing.assert_allclose(
            np.asarray(aux[k]), v.numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"aux {k}",
        )


# --------------------------------------- dense labels / dense clip sampler
def test_dense_labels_to_segments_vs_reference():
    from avt_tpu.data.anticipation import (
        break_segments_by_duration,
        dense_labels_to_segments,
    )

    dense = [(0.0, 2.0, 3), (2.5, 4.0, 5), (6.0, 9.0, 2)]
    cases = [
        dict(segment_start_time=1.0, segment_end_time=8.0),
        dict(segment_start_time=1.0, segment_end_time=8.0, pred_steps=4),
        dict(segment_start_time=0.0, segment_end_time=10.0,
             fixed_duration=0.5, pred_steps=12),
        dict(segment_start_time=4.5, segment_end_time=5.5, pred_steps=3),
    ]
    for kw in cases:
        want = ref_bvd.dense_labels_to_segments(dense, **kw)
        got = dense_labels_to_segments(dense, **kw)
        assert got == want, (kw, got, want)
    assert break_segments_by_duration(3.2, 7, 0.5) == \
        ref_bvd.break_segments_by_duration(3.2, 7, 0.5)


def test_dense_clip_sampler_vs_reference(monkeypatch):
    from pathlib import Path

    from avt_tpu.data.anticipation import dense_clip_sampler

    durations = {"P01_01": 7.3, "P01_02": 4.9}
    monkeypatch.setattr(
        ref_bvd, "get_video_info",
        lambda path, keys: {"len": durations[Path(path).stem]},
    )
    n = 6
    df = pd.DataFrame({
        "uid": np.arange(n),
        "video_path": [Path(f"P01_0{1 + i % 2}.MP4") for i in range(n)],
        "start": np.linspace(0.5, 3.0, n),
        "end": np.linspace(1.5, 4.5, n),
        "participant_id": ["P01"] * n,
        "verb_class": np.arange(n),
        "noun_class": np.arange(n),
        "action_class": np.arange(n),
        "narration": [""] * n,
        "video_id": ["P01_01"] * n,
    })
    want_df, _ = ref_bvd.dense_clip_sampler(
        df.copy(), [Path("/nonexistent")], stride=1.5,
    )
    got_df, _ = dense_clip_sampler(
        df.copy(),
        video_len_fn=lambda p: durations[Path(p).stem],
        stride=1.5,
    )
    assert list(got_df["uid"].astype(str)) == list(want_df["uid"].astype(str))
    for col in ("start", "end"):
        np.testing.assert_allclose(
            got_df[col].to_numpy(dtype=float),
            want_df[col].to_numpy(dtype=float), rtol=1e-9, err_msg=col,
        )
    assert list(got_df["action_class"]) == list(want_df["action_class"])


# --------------------------------- full-composition gradient differential
@pytest.mark.parametrize(
    "variant", ["past_classifier", "cls_mappings", "nce_regression"])
def test_full_composition_grads_vs_reference(variant):
    """d(loss)/d(params) through the FULL composition — backbone -> agg ->
    clip unfold -> AVTh -> past-classifier / cls-mapping marginalization /
    project MLP + regression head -> Basic-op losses weighted by loss_wts
    (func/train.py:207-217) — vs torch autograd on the reference BaseModel
    with the same converted weights and batch (VERDICT r2 weak item 2).

    Torch grads convert to our tree through the same avt_checkpoint_to_flax
    used for weights (every transform is a transpose/reshape, so it maps
    gradients identically), giving a leaf-for-leaf comparison that covers
    EVERY parameter of the model.
    """
    import jax
    from avt_tpu.losses.mse import normed_mse
    from avt_tpu.models import (
        AVTh,
        AVTModel,
        IdentityAgg,
        IdentityBackbone,
        LinearClassifier,
    )
    from avt_tpu.models.import_torch import avt_checkpoint_to_flax, merge_params
    from avt_tpu.train.step import weighted_loss_sum

    ref_bm = ref_harness.import_ref("models.base_model")

    B, clips, crops, C = 2, 10, 2, 24
    n_act, n_verb = 6, 3
    inter, n_layer, n_head = 32, 2, 2
    use_maps = variant == "cls_mappings"
    on_past = variant == "past_classifier"
    nce = variant == "nce_regression"
    cfg = _AttrDict(
        backbone={"_target_": "torch.nn.Identity"},
        backbone_last_n_modules_to_drop=0,
        backbone_dim=C,
        intermediate_featdim=None,
        temporal_aggregator={
            "_target_": "models.temporal_aggregation.Identity"
        },
        same_temp_agg_dim=False,
        future_predictor={
            "_target_": "models.future_prediction.AVTh",
            "output_len": 1, "avg_last_n": 1, "return_past_too": True,
            "inter_dim": inter, "n_layer": n_layer, "n_head": n_head,
            "future_pred_loss": {"_target_": "loss_fn.mse.NormedMSE"},
        },
        project_dim_for_nce=16 if nce else None,
        temporal_aggregator_after_future_pred={
            "_target_": "models.temporal_aggregation.Identity"
        },
        dropout=0.0,
        use_cls_mappings=use_maps,
        classifier={"_target_": "torch.nn.Linear"},
        add_regression_head=nce,
        classifier_on_past=on_past,
        bn=_AttrDict(eps=1e-5, mom=0.1),
    )
    via = np.zeros((n_act, n_verb), np.float32)
    for a in range(n_act):
        via[a, a % n_verb] = 1.0
    torch.manual_seed(23)
    ref = ref_bm.BaseModel(
        cfg,
        num_classes={"action": n_act, "verb": n_verb},
        class_mappings={("verb", "action"): torch.from_numpy(via)},
    ).eval()
    sd = {
        k: v.detach().numpy() for k, v in ref.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    converted = avt_checkpoint_to_flax(sd)

    classifiers = {"action": LinearClassifier(out_features=n_act)}
    if not use_maps:
        classifiers["verb"] = LinearClassifier(out_features=n_verb)
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=C),
        future_predictor=AVTh(
            in_features=C, inter_dim=inter, n_layer=n_layer, n_head=n_head,
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
        project_dim_for_nce=16 if nce else None,
        add_regression_head=nce,
    )

    video = RNG.normal(size=(B, clips, crops, C, 1, 1, 1)).astype(np.float32)
    target_np = {
        "action": RNG.integers(0, n_act, size=(B,)),
        "verb": RNG.integers(0, n_verb, size=(B,)),
    }
    target_np["verb"][0] = -1  # exercise ignore_index through the backward
    subclips_np = None
    if on_past:
        subclips_np = {
            "action": RNG.integers(-1, n_act, size=(B, clips, 3)),
            "verb": RNG.integers(-1, n_verb, size=(B, clips, 3)),
        }
    fut_tgt = (
        RNG.normal(size=(B, clips, 16)).astype(np.float32) if nce else None
    )

    loss_wts = {
        "cls_action": 1.0, "cls_verb": 0.4, "feat": 0.8,
        "past_cls_action": 0.6, "past_cls_verb": 0.3,
        "reg": 0.7, "regm": 0.5,
    }

    # ---- torch side: Basic-op losses + weighted sum + autograd
    ref_loss_fn = ref_ops.BasicLossAccuracy(dataset=None, device="cpu")
    t_out, t_aux = ref(torch.from_numpy(video), target_shape=(B,))
    t_losses, _ = ref_loss_fn(
        t_out, {k: torch.from_numpy(v) for k, v in target_np.items()},
        {k: torch.from_numpy(v) for k, v in subclips_np.items()}
        if subclips_np else None,
    )
    t_losses.update(t_aux)
    if nce:
        # symmetric extra losses driving the NCE projection + regression
        # head (the Basic op has no reg loss; PredFutureFeat grads are
        # pinned elsewhere — this pins the project_mlp/regression_head
        # gradient PATH through the full composition)
        t_losses["reg"] = ref_mse.NormedMSE(reduction="none")(
            t_out["future_projected"], torch.from_numpy(fut_tgt)
        )
        t_losses["regm"] = t_out["logits_regression"].pow(2)
    total_t = sum(
        loss_wts[k] * v.mean() for k, v in t_losses.items()
    )
    total_t.backward()
    grad_sd = {}
    for name, prm in ref.named_parameters():
        if name.endswith(".attn.bias") or name.endswith(".attn.masked_bias"):
            continue
        grad_sd[name] = (
            prm.grad.numpy() if prm.grad is not None
            else np.zeros(prm.shape, np.float32)
        )
    want_grads = avt_checkpoint_to_flax(grad_sd)

    # ---- jax side: same losses, jax.grad over the converted weights
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video), (B,))
    merged = merge_params(params["params"], converted)

    def loss_fn(p):
        outputs, aux = model.apply({"params": p}, jnp.asarray(video), (B,))
        losses, _ = basic_loss_accuracy(
            outputs,
            {k: jnp.asarray(v) for k, v in target_np.items()},
            {k: jnp.asarray(v) for k, v in subclips_np.items()}
            if subclips_np else None,
            num_classes={"action": n_act, "verb": n_verb},
        )
        losses.update(aux)
        if nce:
            losses["reg"] = normed_mse(
                outputs["future_projected"], jnp.asarray(fut_tgt),
                reduction="none",
            )
            losses["regm"] = outputs["logits_regression"] ** 2
        total, _ = weighted_loss_sum(
            losses, {k: loss_wts[k] for k in losses}
        )
        return total

    total_j, got_grads = jax.value_and_grad(loss_fn)(merged)
    np.testing.assert_allclose(
        float(total_j), float(total_t.detach()), rtol=1e-5, atol=1e-6
    )

    # ---- leaf-for-leaf comparison, asserting full coverage
    def walk(want, got, path=""):
        n = 0
        for key, val in want.items():
            assert key in got, f"missing grad subtree {path}{key}"
            if isinstance(val, dict):
                n += walk(val, got[key], path + key + "/")
            else:
                np.testing.assert_allclose(
                    np.asarray(got[key]), np.asarray(val),
                    rtol=1e-4, atol=1e-4, err_msg=f"grad {path}{key}",
                )
                n += 1
        return n

    def count(tree):
        return sum(
            count(v) if isinstance(v, dict) else 1 for v in tree.values()
        )

    compared = walk(want_grads, got_grads)
    assert compared == count(got_grads), (
        f"compared {compared} leaves but model has {count(got_grads)} — "
        "some parameter's gradient was never checked"
    )
