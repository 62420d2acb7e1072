"""Build-and-step matrix over ALL 27 shipped experiment files.

Each expt composes (variant 0 of any sweep), has its /root/repo/DATA paths
rewritten onto a synthetic tree (tests/_expt_fixtures.py), and then the
REAL builders run: build_all_datasets -> DataLoader batch -> build_model ->
model.init -> build_optimizer_from_cfg -> ONE jitted train step (or eval
step for the *_testonly variants) on batches of the config's own shapes.
This turns "composes" into "runs" for every topology the paper shipped —
the wiring the reference exercises in func/train.py:539-658.

expts/06* set conv_to_anticipate_fn.drop_style=rulstm, which the reference
refuses (base_video_dataset.py:102-112 raises NotImplementedError); the
matrix asserts our dataset build refuses identically.

Only the config's batch size is overridden (1 raw-video / 2 feature) to
keep the single CPU core within budget; every other shape (frames, crops,
feature dims, class spaces' structure) is the config's own.
"""

import os
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~35 min of cold XLA:CPU compiles

from avt_tpu.config import Composer, expand_sweeps, parse_overrides_file
from avt_tpu.config.build import (
    build_all_datasets,
    build_model,
    build_optimizer_from_cfg,
    build_preprocess_fns,
    loss_weights,
)

import _expt_fixtures
import ref_harness

REPO = Path(__file__).resolve().parent.parent
CONF_DIR = REPO / "conf"
EXPTS = sorted((REPO / "expts").glob("*.txt"))
DATA_PREFIX = "/root/repo/DATA"


@pytest.fixture(scope="session")
def data_tree(tmp_path_factory):
    pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("expt_data")
    tree = _expt_fixtures.build_data_tree(root)
    _write_timm_vit_ckpts(Path(tree) / "pretrained" / "TIMM")
    return tree


@pytest.fixture(scope="session")
def outputs_tree(tmp_path_factory):
    """Stand-in for the cwd-relative OUTPUTS/ dir the *_testonly expts'
    init_from_model specs point at (prior-run checkpoints)."""
    return tmp_path_factory.mktemp("expt_outputs")


def _write_timm_vit_ckpts(timm_dir: Path):
    """Random ViT-B/16 state_dicts in the raw timm layout, at the exact
    filenames the expts reference (func/train.py:669-688 wiring)."""
    import torch

    timm_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(31)
    D, DEPTH, TOK, MLP = 768, 12, 197, 3072

    def w(*shape):
        return torch.from_numpy(
            (rng.standard_normal(shape) * 0.02).astype(np.float32))

    sd = {
        "cls_token": w(1, 1, D),
        "pos_embed": w(1, TOK, D),
        "patch_embed.proj.weight": w(D, 3, 16, 16),
        "patch_embed.proj.bias": w(D),
        "norm.weight": w(D),
        "norm.bias": w(D),
    }
    for i in range(DEPTH):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": w(D), f"{b}.norm1.bias": w(D),
            f"{b}.attn.qkv.weight": w(3 * D, D),
            f"{b}.attn.qkv.bias": w(3 * D),
            f"{b}.attn.proj.weight": w(D, D), f"{b}.attn.proj.bias": w(D),
            f"{b}.norm2.weight": w(D), f"{b}.norm2.bias": w(D),
            f"{b}.mlp.fc1.weight": w(MLP, D), f"{b}.mlp.fc1.bias": w(MLP),
            f"{b}.mlp.fc2.weight": w(D, MLP), f"{b}.mlp.fc2.bias": w(D),
        })
    for name in ("jx_vit_base_p16_224-80ecf9dd.pth",
                 "jx_vit_base_patch16_224_in21k-e5005f0a.pth"):
        torch.save(sd, str(timm_dir / name))


@pytest.fixture(autouse=True)
def _fake_lmdb(monkeypatch):
    from avt_tpu.data import readers

    monkeypatch.setattr(readers, "lmdb", ref_harness._load_fake_lmdb(),
                        raising=False)
    monkeypatch.setattr(readers, "HAVE_LMDB", True, raising=False)


def _rewrite(node, data_dir: str):
    if isinstance(node, dict):
        return {k: _rewrite(v, data_dir) for k, v in node.items()}
    if isinstance(node, list):
        return [_rewrite(v, data_dir) for v in node]
    if isinstance(node, str) and DATA_PREFIX in node:
        return node.replace(DATA_PREFIX, data_dir)
    return node


def _map_init_path(path: str, outputs_dir: str) -> str:
    """Root the spec's prior-run/placeholder paths into the test tree;
    DATA/pretrained paths were already moved by _rewrite."""
    i = path.find("OUTPUTS/")
    if i >= 0:
        return os.path.join(outputs_dir, path[i + len("OUTPUTS/"):])
    if path.startswith("/path/to/"):  # 05's RULSTM placeholder
        return os.path.join(outputs_dir, path[len("/path/to/"):])
    return path


def _compose_patched(expt: Path, data_dir: str, outputs_dir: str = None):
    variants = expand_sweeps(parse_overrides_file(expt))
    cfg = Composer(CONF_DIR).compose("config", variants[0])
    cfg = _rewrite(cfg, data_dir)
    raw = "IdentityBackbone" not in cfg["model"]["backbone"]["_target_"]
    spec = cfg["train"]["init_from_model"]
    if spec and outputs_dir:
        # resolve the REAL [module[, prefix], path] specs against fixture
        # checkpoints instead of neutralizing them (func/train.py:669-688)
        cfg["train"]["init_from_model"] = [
            [*s[:-1], _map_init_path(str(s[-1]), outputs_dir)] for s in spec
        ]
    elif spec:
        cfg["train"]["init_from_model"] = None
    cfg["train"]["batch_size"] = 1 if raw else 2
    cfg["eval"]["batch_size"] = 1 if raw else 2
    cfg["data_train"]["workers"] = 2
    cfg["data_eval"]["workers"] = 2
    return cfg, raw


def _one_batch(dataset, batch_size, keys):
    from avt_tpu.data.loader import DataLoader

    loader = DataLoader(
        dataset, batch_size, shuffle=True, drop_last=True, num_workers=2,
        seed=0, keys=keys,
    )
    assert len(loader) >= 1, "synthetic dataset too small for one batch"
    return next(iter(loader))


KEYS = ["video", "target", "target_subclips", "idx"]


def _subtree(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _ensure_init_ckpts(spec, cfg, params):
    """Fabricate any missing prior-run/external checkpoints the spec names,
    in the format each path implies: an orbax TrainState dir ('checkpoint'),
    a torch {'model': sd} run checkpoint (.pth under OUTPUTS), or an
    original RULSTM .pth.tar. Returns probe paths into the variables tree
    whose leaves MUST change after init_from_model — proving the spec
    actually resolved (reference init wiring, func/train.py:669-688)."""
    import jax
    import torch

    rng = np.random.default_rng(47)
    probes = []
    for s in spec:
        path = str(s[-1])
        if path.endswith("/checkpoint") or os.path.isdir(path):
            if not os.path.isdir(path):
                import orbax.checkpoint as ocp

                # the model's own init, perturbed RELATIVELY (the forward
                # must stay numerically sane): merging it back must change
                # the probed (non-zero-init) kernel leaf
                def bump(a):
                    a = np.asarray(a)
                    if np.issubdtype(a.dtype, np.floating):
                        return a * np.float32(1.0 + 1e-3)
                    return a

                payload = {
                    "state": {"params": jax.tree.map(bump, params)},
                    "epoch": np.asarray(1.0),
                }
                ocp.PyTreeCheckpointer().save(os.path.abspath(path), payload)
            task = sorted(
                k for k in params["params"] if k.startswith("classifiers_")
            )[0]
            probes.append(("params", task, "fc", "kernel"))
        elif path.endswith(".pth.tar"):  # original RULSTM checkpoint (05)
            if not os.path.exists(path):
                roll = _subtree(params, ("params", "temporal_aggregator",
                                         "rolling"))
                C = np.asarray(roll["ii"]["kernel"]).shape[0]
                H = np.asarray(roll["hi"]["kernel"]).shape[0]
                cls_k = np.asarray(_subtree(
                    params, ("params", "classifiers_action", "fc", "kernel")))

                def w(*shape):
                    return torch.from_numpy(
                        (rng.standard_normal(shape) * 0.05).astype(np.float32)
                    )

                sd = {}
                for lstm in ("rolling_lstm", "unrolling_lstm"):
                    sd[f"{lstm}.weight_ih_l0"] = w(4 * H, C)
                    sd[f"{lstm}.weight_hh_l0"] = w(4 * H, H)
                    sd[f"{lstm}.bias_ih_l0"] = w(4 * H)
                    sd[f"{lstm}.bias_hh_l0"] = w(4 * H)
                sd["classifier.1.weight"] = w(cls_k.shape[1], cls_k.shape[0])
                sd["classifier.1.bias"] = w(cls_k.shape[1])
                os.makedirs(os.path.dirname(path), exist_ok=True)
                torch.save(sd, path)
            probes.append(("params", "temporal_aggregator", "rolling",
                           "ii", "kernel"))
            probes.append(("params", "classifiers_action", "fc", "kernel"))
        elif "TIMM" in path:
            probes.append(("params", "backbone", "cls_token"))
        else:  # prior-run torch checkpoint: {'model': full AVT state_dict}
            if not os.path.exists(path):
                ref_future = ref_harness.import_ref("models.future_prediction")
                fp = cfg["model"]["future_predictor"]
                in_f = (cfg["model"].get("intermediate_featdim")
                        or cfg["model"]["backbone_dim"])
                torch.manual_seed(13)
                avth = ref_future.AVTh(
                    in_features=in_f,
                    inter_dim=fp["inter_dim"], n_layer=fp["n_layer"],
                    n_head=fp["n_head"], output_len=fp.get("output_len", 1),
                    avg_last_n=fp.get("avg_last_n", 1),
                    future_pred_loss={"_target_": "loss_fn.mse.NormedMSE"},
                )
                sd = {
                    f"future_predictor.{k}": v
                    for k, v in avth.state_dict().items()
                }
                os.makedirs(os.path.dirname(path), exist_ok=True)
                torch.save({"model": sd}, path)
            probes.append(("params", "future_predictor"))
    return probes


def _apply_init_spec(cfg, params):
    """Run the REAL init_from_model against the spec and assert every
    probed subtree actually changed (no silent no-op init)."""
    import jax

    from avt_tpu.models.import_torch import init_from_model

    spec = cfg["train"].get("init_from_model")
    if not spec:
        return params
    probes = _ensure_init_ckpts(spec, cfg, params)
    inited = init_from_model(params, spec)
    for probe in probes:
        before = jax.tree_util.tree_leaves(_subtree(params, probe))
        after = jax.tree_util.tree_leaves(_subtree(inited, probe))
        assert any(
            np.any(np.asarray(a) != np.asarray(b))
            for a, b in zip(after, before)
        ), f"init_from_model left probe {probe} untouched"
    return inited


@pytest.mark.parametrize("expt", EXPTS, ids=[e.stem for e in EXPTS])
def test_expt_builds_and_steps(expt, data_tree, outputs_tree):
    import jax
    import jax.numpy as jnp

    from avt_tpu.train import TrainState, make_eval_step, make_train_step

    cfg, raw = _compose_patched(expt, str(data_tree), str(outputs_tree))

    if expt.stem == "06_ek100_avt_tsnflow":
        # drop_style=rulstm: the flow config as shipped does not run against
        # the shipped code (reference base_video_dataset.py:102-112); the
        # 06 test variants override drop_style=correct and must run
        with pytest.raises(NotImplementedError):
            build_all_datasets(cfg)
        return

    train_datasets, eval_datasets = build_all_datasets(cfg)
    assert len(train_datasets) >= 1
    train_ds = train_datasets[0]
    assert len(train_ds) >= cfg["train"]["batch_size"], (
        f"{len(train_ds)} usable rows after anticipation conversion"
    )
    num_classes = {k: len(v) for k, v in train_ds.classes.items()}
    class_mappings = train_ds.class_mappings
    model = build_model(cfg, num_classes, class_mappings)

    train_pp_fn = eval_pp_fn = None
    if raw:
        train_pp_fn, eval_pp_fn = build_preprocess_fns(cfg)

    if cfg.get("test_only"):
        # *_testonly: the reference short-circuits to evaluate
        # (func/train.py:793-797) — build + run ONE eval step on the eval
        # dataset, incl. the 3-crop+flip view stack for raw-video configs
        ds = eval_datasets[""]
        batch = _one_batch(ds, cfg["eval"]["batch_size"], KEYS)
        video = jnp.asarray(batch["video"])
        if raw:
            video = eval_pp_fn(video)
        params = model.init(
            jax.random.PRNGKey(0), video,
            next(iter(batch["target"].values())).shape,
        )
        params = _apply_init_spec(cfg, params)
        eval_step = make_eval_step(model, num_classes=num_classes)
        jbatch = {
            "video": video,
            "target": {k: jnp.asarray(v) for k, v in batch["target"].items()},
        }
        if "target_subclips" in batch:
            jbatch["target_subclips"] = {
                k: jnp.asarray(v) for k, v in batch["target_subclips"].items()
            }
        res = jax.block_until_ready(eval_step(params, jbatch))
        for task in batch["target"]:
            assert f"logits/{task}" in res
            assert np.isfinite(np.asarray(res[f"logits/{task}"])).all()
        return

    batch = _one_batch(train_ds, cfg["train"]["batch_size"], KEYS)
    video = jnp.asarray(batch["video"])
    init_video = (
        train_pp_fn(video, jax.random.PRNGKey(0)) if raw else video
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_video, next(iter(batch["target"].values())).shape,
    )
    params = _apply_init_spec(cfg, params)
    tx, _ = build_optimizer_from_cfg(
        cfg, params, iters_per_epoch=10, world_size=1
    )
    step = make_train_step(
        model, tx, loss_weights(cfg), num_classes=num_classes,
        preprocess_fn=train_pp_fn, donate=False,  # state reused below
    )
    state = TrainState.create(params, tx)
    jbatch = {
        "video": video,
        "target": {k: jnp.asarray(v) for k, v in batch["target"].items()},
    }
    if "target_subclips" in batch:
        jbatch["target_subclips"] = {
            k: jnp.asarray(v) for k, v in batch["target_subclips"].items()
        }
    new_state, metrics = jax.block_until_ready(
        step(state, jbatch, jax.random.PRNGKey(2))
    )
    assert np.isfinite(float(metrics["loss"])), metrics
    assert int(new_state.step) == 1
    # gradients flowed: params moved, or (zero-LR warmup start, e.g. the
    # shipped init_lr_ratio=0 cosine warmups) the momentum/stat buffers did
    def _changed(a, b):
        return any(
            bool(np.any(np.asarray(x) != np.asarray(y)))
            for x, y in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            )
        )

    assert _changed(state.params, new_state.params) or _changed(
        state.opt_state, new_state.opt_state
    ), "train step changed neither params nor optimizer state"
