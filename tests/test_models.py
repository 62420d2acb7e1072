"""Model stack tests: AVT-h head + composition root (the expts/02 shape)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avt_tpu.losses import mse
from avt_tpu.models import (
    AVTh,
    AVTModel,
    IdentityAgg,
    IdentityBackbone,
    IdentityFuture,
    LinearClassifier,
    MeanAgg,
    TransformerAgg,
)

RNG = np.random.default_rng(0)


def _avth(**kw):
    args = dict(
        in_features=1024,
        inter_dim=256,
        n_layer=2,
        n_head=4,
        output_len=1,
        avg_last_n=1,
        return_past_too=True,
        future_pred_loss=lambda p, t: mse(p, t, reduction="none"),
    )
    args.update(kw)
    return AVTh(**args)


def test_avth_shapes_and_loss():
    model = _avth()
    feats = jnp.asarray(RNG.normal(size=(2, 10, 1024)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats)
    past, future, losses, endpoints = model.apply(params, feats)
    # return_past_too + avg_last_n=1: final = mean of last 1 of
    # cat([past(10), outputs[9:10]]) -> (B, C)
    assert future.shape == (2, 1024)
    assert past.shape == (2, 10, 1024)
    assert losses["feat"].shape == (2, 9, 1024)  # unreduced teacher-forced
    # updated_past[0] == input[0] (GT first frame kept)
    np.testing.assert_allclose(np.asarray(past[:, 0]), np.asarray(feats[:, 0]))


def test_avth_rollout_lengths():
    model = _avth(output_len=3, return_past_too=False, avg_last_n=-1)
    feats = jnp.asarray(RNG.normal(size=(2, 5, 1024)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats)
    past, future, losses, _ = model.apply(params, feats)
    assert future.shape == (2, 3, 1024)  # last output_len predictions
    assert past.shape == (2, 5, 1024)


def test_avth_rollout_consistency_with_longer_input():
    """Rolled-out step k must equal a teacher-forced pass where the fed-back
    hidden is injected — i.e. the recompute rollout is self-consistent:
    running with output_len=2 must give the same first-T outputs as
    output_len=1 (causality: extra future tokens can't change the past)."""
    m1 = _avth(output_len=1, return_past_too=True, avg_last_n=-1)
    m2 = _avth(output_len=2, return_past_too=True, avg_last_n=-1)
    feats = jnp.asarray(RNG.normal(size=(1, 6, 1024)).astype(np.float32))
    params = m1.init(jax.random.PRNGKey(0), feats)
    past1, fut1, _, _ = m1.apply(params, feats)
    past2, fut2, _, _ = m2.apply(params, feats)
    np.testing.assert_allclose(np.asarray(past1), np.asarray(past2), atol=1e-5)
    # return_past_too: fut = cat([prev (6), outputs[5:]]) -> m1: 7, m2: 8
    assert fut1.shape[1] == 7 and fut2.shape[1] == 8
    np.testing.assert_allclose(
        np.asarray(fut1[:, :7]), np.asarray(fut2[:, :7]), atol=1e-5
    )


def test_avth_eval_output_len():
    m = _avth(output_len=1, output_len_eval=2, return_past_too=False, avg_last_n=-1)
    feats = jnp.asarray(RNG.normal(size=(1, 4, 1024)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), feats)
    _, fut_eval, _, _ = m.apply(
        params, feats, train=False
    )
    assert fut_eval.shape[1] == 2  # eval uses output_len_eval
    _, fut_train, _, _ = m.apply(
        params, feats, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert fut_train.shape[1] == 1  # train uses output_len


def _build_expts02_model(num_classes=(("action", 11),), cls_mappings=(), **kw):
    classifiers = {
        name: LinearClassifier(out_features=n)
        for name, n in num_classes[:1]
    } if kw.pop("use_cls_mappings", False) else {
        name: LinearClassifier(out_features=n) for name, n in num_classes
    }
    use_maps = len(classifiers) < len(num_classes)
    return AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=1024),
        future_predictor=_avth(inter_dim=128, n_layer=2, n_head=4),
        temporal_aggregator_after_future_pred=IdentityFuture(in_features=1024),
        classifiers=classifiers,
        num_classes=num_classes,
        class_mappings=cls_mappings,
        backbone_dim=1024,
        dropout=0.2,
        classifier_on_past=True,
        use_cls_mappings=use_maps,
        **kw,
    )


class _IdentityAfterAgg(IdentityAgg):
    """After-future aggregator returning (feats, {})."""


def test_avt_model_expts02_forward():
    # expts/02 topology: identity backbone on features, identity agg over
    # 1-frame subclips, AVT-h, linear classifier, past classifier on.
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=1024),
        future_predictor=_avth(inter_dim=128, n_layer=2, n_head=4),
        temporal_aggregator_after_future_pred=_IdentityAfterAgg(in_features=1024),
        classifiers={"action": LinearClassifier(out_features=11)},
        num_classes=(("action", 11),),
        backbone_dim=1024,
        dropout=0.2,
        classifier_on_past=True,
    )
    # feature "video": (B, #clips=10, C=1024, T=1, H=1, W=1)
    video = jnp.asarray(RNG.normal(size=(2, 10, 1024, 1, 1, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video, (2,))
    outputs, aux = model.apply(params, video, (2,))
    assert outputs["logits/action"].shape == (2, 11)
    assert outputs["past_logits/action"].shape == (2, 10, 11)
    assert outputs["temp_agg"].shape == (2 * 10, 1, 1024)
    assert outputs["past"].shape == (2, 10, 1024)
    assert outputs["future"].shape == (2, 1024)
    assert aux["feat"].shape == (2, 9, 1024)
    assert np.isfinite(np.asarray(outputs["logits/action"])).all()


def test_avt_model_class_mapping_marginalization():
    # action classifier only; verb/noun derived via 0/1 mapping matmul
    n_act, n_verb = 6, 3
    via = np.zeros((n_act, n_verb), np.float32)
    for a in range(n_act):
        via[a, a % n_verb] = 1.0
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=64),
        future_predictor=IdentityFuture(in_features=64),
        temporal_aggregator_after_future_pred=_IdentityAfterAgg(in_features=64),
        classifiers={"action": LinearClassifier(out_features=n_act)},
        num_classes=(("action", n_act), ("verb", n_verb)),
        class_mappings=((("verb", "action"), via),),
        backbone_dim=64,
        use_cls_mappings=True,
    )
    video = jnp.asarray(RNG.normal(size=(2, 1, 64, 4, 1, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    outputs, _ = model.apply(params, video)
    act = np.asarray(outputs["logits/action"])
    verb = np.asarray(outputs["logits/verb"])
    np.testing.assert_allclose(verb, act @ via, rtol=1e-6)


def test_avt_model_multicrop_averages():
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=MeanAgg(in_features=32),
        future_predictor=IdentityFuture(in_features=32),
        temporal_aggregator_after_future_pred=_IdentityAfterAgg(in_features=32),
        classifiers={"action": LinearClassifier(out_features=5)},
        num_classes=(("action", 5),),
        backbone_dim=32,
    )
    video = jnp.asarray(RNG.normal(size=(2, 1, 3, 32, 4, 1, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    outputs, _ = model.apply(params, video)
    # averaging over 3 crops == mean of per-crop logits
    per_crop = [
        model.apply(params, video[:, :, i])[0]["logits/action"] for i in range(3)
    ]
    np.testing.assert_allclose(
        np.asarray(outputs["logits/action"]),
        np.mean([np.asarray(p) for p in per_crop], axis=0),
        rtol=1e-5,
        atol=1e-6,
    )


def test_transformer_agg_cloze_loss():
    agg = TransformerAgg(
        in_features=64, inter_rep=32, nheads=4, nlayers=1,
        cloze_loss_ratio=0.5, cloze_loss_wt=1.0,
    )
    feats = jnp.asarray(RNG.normal(size=(2, 8, 64)).astype(np.float32))
    params = agg.init(
        {"params": jax.random.PRNGKey(0), "cloze": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        feats, train=True,
    )
    out, aux = agg.apply(
        params, feats, train=True,
        rngs={"cloze": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    assert out.shape == (2, 32)
    assert "tx_mlm" in aux and float(aux["tx_mlm"]) > 0
    # eval: no cloze loss
    out_eval, aux_eval = agg.apply(params, feats, train=False)
    assert "tx_mlm" not in aux_eval


def test_model_grads_flow():
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=128),
        future_predictor=_avth(in_features=128, inter_dim=64, n_layer=1, n_head=2),
        temporal_aggregator_after_future_pred=_IdentityAfterAgg(in_features=128),
        classifiers={"action": LinearClassifier(out_features=7)},
        num_classes=(("action", 7),),
        backbone_dim=128,
        classifier_on_past=True,
    )
    video = jnp.asarray(RNG.normal(size=(2, 6, 128, 1, 1, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)

    def loss_fn(p):
        outputs, aux = model.apply(p, video)
        return jnp.mean(outputs["logits/action"] ** 2) + jnp.mean(aux["feat"])

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: jnp.abs(g).sum(), grads))
    total = sum(float(x) for x in flat)
    assert np.isfinite(total) and total > 0


def test_from_scratch_init_statistics():
    """From-scratch init matches the reference (VERDICT r1 item 4):
    GPT core weights N(0, 0.02) (HF 4.2.2 _init_weights,
    future_prediction.py:89-95); nn.Linear equivalents outside it N(0, 0.01)
    (base_model.py:110-127)."""
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=256),
        future_predictor=_avth(in_features=256, inter_dim=512, n_layer=3),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=256),
        classifiers={"action": LinearClassifier(out_features=1000)},
        num_classes=(("action", 1000),),
        backbone_dim=256,
        project_dim_for_nce=128,
    )
    video = jnp.zeros((2, 10, 256, 1, 1, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), video, (2,))["params"]

    def std_of(path):
        node = params
        for k in path.split("/"):
            node = node[k]
        return float(jnp.std(node["kernel" if "kernel" in node else "embedding"]
                             if isinstance(node, dict) else node))

    fut = params["future_predictor"]
    # GPT core: wpe + every Dense kernel at 0.02
    gpt = fut["gpt"]
    assert abs(float(jnp.std(gpt["wpe"])) - 0.02) < 0.002
    for blk in ("h_0", "h_1", "h_2"):
        for kern in (
            gpt[blk]["attn"]["qkv"]["kernel"],
            gpt[blk]["attn"]["proj"]["kernel"],
            gpt[blk]["mlp_fc"]["kernel"],
            gpt[blk]["mlp_proj"]["kernel"],
        ):
            assert abs(float(jnp.std(kern)) - 0.02) < 0.004, blk
    # AVTh encoder/decoder + classifier + project_mlp: 0.01
    for kern in (
        fut["encoder"]["kernel"],
        fut["decoder"]["kernel"],
        params["classifiers_action"]["fc"]["kernel"],
        params["project_mlp"]["fc1"]["kernel"],
    ):
        assert abs(float(jnp.std(kern)) - 0.01) < 0.002
    # biases zero
    assert float(jnp.abs(params["classifiers_action"]["fc"]["bias"]).max()) == 0.0


def test_vit_gelu_policy_and_bf16_consistency():
    """f32 ViT uses exact erf GELU (timm parity); bf16 auto-switches to the
    tanh approximation, whose error must stay within bf16 rounding of the
    f32-exact reference (models/vit.py ViTBlock.gelu_approx)."""
    from avt_tpu.models.vit import ViT

    v = jnp.asarray(RNG.normal(size=(1, 3, 2, 32, 32)).astype(np.float32))
    vit32 = ViT(img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2)
    params = vit32.init(jax.random.PRNGKey(0), v)
    out32 = vit32.apply(params, v)

    # explicit exact-GELU f32 == default f32 (policy resolves to exact)
    vit32_exact = ViT(img_size=32, patch_size=16, embed_dim=64, depth=2,
                      num_heads=2, gelu_approx=False)
    np.testing.assert_array_equal(np.asarray(out32),
                                  np.asarray(vit32_exact.apply(params, v)))
    # f32 with tanh approx differs (proves the policy bit is live)
    vit32_tanh = ViT(img_size=32, patch_size=16, embed_dim=64, depth=2,
                     num_heads=2, gelu_approx=True)
    assert not np.array_equal(np.asarray(out32),
                              np.asarray(vit32_tanh.apply(params, v)))

    # bf16 (auto tanh) stays within bf16-rounding distance of f32-exact:
    # compare against bf16-exact-gelu as the rounding yardstick
    vit16 = ViT(img_size=32, patch_size=16, embed_dim=64, depth=2,
                num_heads=2, dtype=jnp.bfloat16)
    vit16_exact = ViT(img_size=32, patch_size=16, embed_dim=64, depth=2,
                      num_heads=2, dtype=jnp.bfloat16, gelu_approx=False)
    out16 = np.asarray(vit16.apply(params, v), dtype=np.float32)
    out16_exact = np.asarray(vit16_exact.apply(params, v), dtype=np.float32)
    ref = np.asarray(out32, dtype=np.float32)
    err_tanh = np.abs(out16 - ref).mean()
    err_exact = np.abs(out16_exact - ref).mean()
    assert err_tanh < max(2.5 * err_exact, 1e-2), (err_tanh, err_exact)


def test_enable_compile_cache(tmp_path, monkeypatch):
    """enable_compile_cache persists on TPU, is a hard no-op on the CPU
    backend (XLA:CPU AOT entries trip cpu_aot_loader's host-feature check
    on every reload), and AVT_TPU_NO_CACHE disables it everywhere
    (utils/compile_cache.py)."""
    import os as _os

    import avt_tpu.utils.compile_cache as cc

    prev = jax.config.jax_compilation_cache_dir
    try:
        # tests run on the CPU backend: must be a no-op, no dir created
        target = str(tmp_path / "cpu_cache")
        cc.enable_compile_cache(target)
        assert jax.config.jax_compilation_cache_dir == prev
        assert not _os.path.exists(target)

        # TPU (or any non-cpu platform): persists at the given dir
        monkeypatch.setattr(cc, "_intended_platform", lambda: "tpu")
        target = str(tmp_path / "tpu_cache")
        cc.enable_compile_cache(target)
        assert jax.config.jax_compilation_cache_dir == target
        assert _os.path.isdir(target)

        monkeypatch.setenv("AVT_TPU_NO_CACHE", "1")
        cc.enable_compile_cache(str(tmp_path / "other"))  # disabled: no-op
        assert jax.config.jax_compilation_cache_dir == target
        monkeypatch.delenv("AVT_TPU_NO_CACHE")

        # platform NOT explicitly configured: the ACTUAL backend decides —
        # an implicit-CPU fallback (host without the TPU tunnel) must not
        # persist either
        jax.config.update("jax_compilation_cache_dir", prev)
        monkeypatch.setattr(cc, "_intended_platform", lambda: "default")
        target = str(tmp_path / "implicit_cpu")
        cc.enable_compile_cache(target)  # default_backend() is cpu here
        assert jax.config.jax_compilation_cache_dir == prev
        assert not _os.path.exists(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_avth_rollout_under_dropout_warns_nothing():
    """Rollout>1 training with dropout used to warn about per-step mask
    re-sampling; position-stable dropout (models/layers.py dropout_key)
    made the recompute cache-faithful, so NO warning may fire — the
    equivalence itself is pinned by test_rollout_dropout_cache_equiv."""
    import warnings

    for m in (
        _avth(output_len=2, return_past_too=False, avg_last_n=-1,
              attn_pdrop=0.1),
        _avth(attn_pdrop=0.1),  # shipped configs: output_len == 1
    ):
        feats = jnp.asarray(RNG.normal(size=(1, 4, 1024)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), feats)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            m.apply(params, feats, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})


def test_avt_model_multicrop_batched_matches_per_crop_full():
    """The batched-crop forward (crops stacked into the batch dim,
    models/base.py __call__) equals the per-crop loop on EVERY endpoint
    and per-sample aux loss, incl. subclips + AVT-h feat loss."""
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=1024),
        future_predictor=_avth(inter_dim=128, n_layer=2, n_head=4),
        temporal_aggregator_after_future_pred=_IdentityAfterAgg(in_features=1024),
        classifiers={"action": LinearClassifier(out_features=7)},
        num_classes=(("action", 7),),
        backbone_dim=1024,
        classifier_on_past=True,
    )
    B, clips, crops = 2, 4, 3
    video = jnp.asarray(
        RNG.normal(size=(B, clips, crops, 1024, 1, 1, 1)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), video, (B,))
    outputs, aux = model.apply(params, video, (B,))
    per = [model.apply(params, video[:, :, i], (B,)) for i in range(crops)]
    for key in outputs:
        want = np.mean([np.asarray(p[0][key]) for p in per], axis=0)
        np.testing.assert_allclose(
            np.asarray(outputs[key]), want, rtol=1e-5, atol=1e-5,
            err_msg=f"endpoint {key}",
        )
    assert aux["feat"].shape == (B, clips - 1, 1024)
    want_feat = np.mean([np.asarray(p[1]["feat"]) for p in per], axis=0)
    np.testing.assert_allclose(
        np.asarray(aux["feat"]), want_feat, rtol=1e-5, atol=1e-5
    )


def test_rollout_dropout_cache_equiv():
    """Position-stable rollout dropout == KV-cache semantics.

    The property that makes the static-recompute rollout faithful to the
    reference's cached rollout under train-time dropout
    (future_prediction.py:168-202): with one shared dropout key, the GPT
    core's output for a PREFIX equals the corresponding slice of the output
    for the FULL buffer — i.e. recomputing earlier tokens regenerates
    bit-identical activations, exactly what a KV cache would have reused.
    """
    from avt_tpu.models.layers import GPT2Core

    core = GPT2Core(
        n_layer=2, n_head=4, embd_dropout=0.3, attn_dropout=0.3,
        resid_dropout=0.3,
    )
    B, T, C = 2, 8, 64
    x = jnp.asarray(RNG.normal(size=(B, T, C)).astype(np.float32))
    params = core.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
    )
    dkey = jax.random.PRNGKey(42)
    full = core.apply(
        params, x, train=True, dropout_key=dkey,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    for t in (3, 5, 7):
        prefix = core.apply(
            params, x[:, :t], train=True, dropout_key=dkey,
            rngs={"dropout": jax.random.PRNGKey(3)},  # unused under PSD
        )
        # identical masks + identical math; only reduction-order rounding
        # differs between the (B,t,*) and (B,T,*) softmax shapes
        np.testing.assert_allclose(
            np.asarray(prefix), np.asarray(full[:, :t]), rtol=1e-5, atol=1e-6
        )
    # sanity: dropout is actually active (train != eval output)
    ev = core.apply(params, x, train=False)
    assert not np.allclose(np.asarray(ev), np.asarray(full))


def test_rollout_cache_equals_recompute():
    """rollout_mode='cache' (prefill + single-token KV-cache decode steps)
    must produce the same outputs as the default static recompute — at
    eval, under train-time dropout (position-stable masks make the cached
    step's activations identical to the recompute pass's at that
    position), and in the quantized feedback mode. Only softmax
    reduction-order rounding may differ (single-query masked attention vs
    the full causal pass)."""
    common = dict(
        in_features=64, inter_dim=64, n_layer=2, n_head=4, output_len=4,
        avg_last_n=-1, return_past_too=False,
        future_pred_loss=lambda p, t: mse(p, t, reduction="none"),
    )
    feats = jnp.asarray(RNG.normal(size=(2, 6, 64)).astype(np.float32))
    for extra, train in (
        (dict(), False),
        (dict(embd_pdrop=0.3, attn_pdrop=0.3, resid_pdrop=0.3), True),
    ):
        rec = AVTh(**common, rollout_mode="recompute", **extra)
        cch = AVTh(**common, rollout_mode="cache", **extra)
        params = rec.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            feats,
        )
        r = {"dropout": jax.random.PRNGKey(7)}
        o1 = rec.apply(params, feats, train=train, rngs=r)
        o2 = cch.apply(params, feats, train=train, rngs=r)
        for a, b, name in (
            (o1[0], o2[0], "updated_past"),
            (o1[1], o2[1], "final"),
            (o1[2]["feat"], o2[2]["feat"], "feat loss"),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5,
                err_msg=f"{name} train={train}",
            )


def test_rollout_cache_quantized_and_validation():
    """Cache mode through the embedding-input + quantize-before-rollout
    feedback (argmax ids re-encoded each step), and the rollout_mode
    validation error."""
    kw = dict(
        in_features=1, inter_dim=64, n_layer=2, n_head=4, output_len=4,
        avg_last_n=-1, return_past_too=False, num_cluster_centers=32,
        quantize_before_rollout=True,
    )
    ids = jnp.asarray(RNG.integers(0, 32, size=(2, 6, 1)).astype(np.float32))
    rec = AVTh(**kw, rollout_mode="recompute")
    cch = AVTh(**kw, rollout_mode="cache")
    params = rec.init(jax.random.PRNGKey(0), ids)
    o1 = rec.apply(params, ids)
    o2 = cch.apply(params, ids)
    np.testing.assert_allclose(
        np.asarray(o1[0]), np.asarray(o2[0]), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o1[1]), np.asarray(o2[1]), rtol=2e-5, atol=1e-5
    )
    with pytest.raises(ValueError, match="rollout_mode"):
        AVTh(in_features=64, rollout_mode="nope", output_len=1).init(
            jax.random.PRNGKey(0), jnp.ones((1, 4, 64))
        )


def test_avth_rollout_with_dropout_trains():
    """AVTh output_len=3 + dropout>0: rollout runs, loss is finite, and the
    forward is deterministic given the rng (masks keyed off position, so
    the recompute passes agree with each other)."""
    model = _avth(output_len=3, avg_last_n=-1, embd_pdrop=0.2,
                  attn_pdrop=0.2, resid_pdrop=0.2)
    feats = jnp.asarray(RNG.normal(size=(2, 6, 1024)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats,
    )
    r = {"dropout": jax.random.PRNGKey(5)}
    past1, fin1, losses1, _ = model.apply(params, feats, train=True, rngs=r)
    past2, fin2, losses2, _ = model.apply(params, feats, train=True, rngs=r)
    np.testing.assert_array_equal(np.asarray(fin1), np.asarray(fin2))
    np.testing.assert_array_equal(np.asarray(past1), np.asarray(past2))
    assert np.isfinite(np.asarray(losses1["feat"])).all()
    # different rng -> different masks
    fin3 = model.apply(
        params, feats, train=True, rngs={"dropout": jax.random.PRNGKey(6)}
    )[1]
    assert not np.allclose(np.asarray(fin1), np.asarray(fin3))
