"""Import harness for the upstream reference at /root/reference.

The reference is pure torch + pandas, but its modules import several
packages that are absent in this environment (hydra, omegaconf, submitit,
torchvision, lmdb, timm).  This module installs *minimal* stand-ins into
``sys.modules`` — just enough surface for the reference modules under test
to import and run — then puts /root/reference on sys.path so tests can do

    ref_sched = ref_harness.import_ref("common.scheduler")

and compare avt_tpu outputs against the genuine reference implementation.

The stubs deliberately implement only what the reference call sites use:
  * hydra.utils.instantiate / hydra.utils.call resolving `_target_` dotted
    paths (hydra 1.1 semantics used at e.g. func/train_eval_ops.py:98,
    models/future_prediction.py:102)
  * hydra.types.TargetConf (a type annotation only)
  * omegaconf.OmegaConf.get_type (datasets/base_video_dataset.py:363,411)
  * torchvision.set_video_backend no-op + transforms.Compose annotation
    (datasets/base_video_dataset.py:38,284)
  * submitit.JobEnvironment raising RuntimeError outside a job
    (common/utils.py:115-118 catches exactly that)
  * lmdb -> tests/_fake_lmdb.py (a real read-only implementation, shared
    with the avt_tpu LMDB reader tests)
"""
from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"


def _resolve_target(target: str):
    mod, _, name = target.rpartition(".")
    return getattr(importlib.import_module(mod), name)


def _make_hydra_stub():
    hydra = types.ModuleType("hydra")
    hydra_types = types.ModuleType("hydra.types")
    hydra_types.TargetConf = dict
    hydra_utils = types.ModuleType("hydra.utils")

    def instantiate(cfg, *args, **kwargs):
        if cfg is None:
            return None
        cfg = dict(cfg)
        target = cfg.pop("_target_")
        cfg.update(kwargs)
        # hydra 1.1 default: recursive instantiation of nested TargetConf
        # values unless _recursive_=False (passed in the conf OR as a call
        # kwarg, e.g. breakfast_50salads.py init_df); either way it must
        # not leak into the target's kwargs
        recursive = cfg.pop("_recursive_", True)
        if recursive:
            cfg = {
                k: instantiate(v)
                if isinstance(v, dict) and "_target_" in v else v
                for k, v in cfg.items()
            }
        return _resolve_target(target)(*args, **cfg)

    hydra_utils.instantiate = instantiate
    hydra_utils.call = instantiate
    hydra.types = hydra_types
    hydra.utils = hydra_utils
    return {"hydra": hydra, "hydra.types": hydra_types, "hydra.utils": hydra_utils}


def _make_omegaconf_stub():
    omegaconf = types.ModuleType("omegaconf")

    class OmegaConf:  # noqa: D401 - tiny stand-in
        @staticmethod
        def get_type(obj):
            return type(obj)

        @staticmethod
        def to_container(obj, *a, **k):
            return obj

        @staticmethod
        def create(obj=None):
            return obj

    omegaconf.OmegaConf = OmegaConf
    omegaconf.DictConfig = dict
    omegaconf.ListConfig = list
    return {"omegaconf": omegaconf}


def _make_torchvision_stub():
    tv = types.ModuleType("torchvision")
    tv.set_video_backend = lambda *a, **k: None
    tv_transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    tv_transforms.Compose = Compose
    tv.transforms = tv_transforms
    return {"torchvision": tv, "torchvision.transforms": tv_transforms}


def install_train_stubs():
    """Extra torchvision surface so `func.train` itself imports: transform
    classes (common/transforms.py pulls five torchvision.transforms names),
    dataset samplers, and video_utils.VideoClips (isinstance targets only).
    """
    install_stubs()
    install_notebook_stubs()  # func/train.py imports notebooks.utils
    tv = sys.modules["torchvision"]
    tvt = tv.transforms
    # ctor-tolerant: common/transforms.py SUBCLASSES RandomCrop and
    # constructs ColorJitter(*args) at pipeline-build time (func/train.py
    # builds the full transform list even for feature datasets, where it
    # is never applied — base_video_dataset.py:742-758 permute branch)
    for name in ("RandomCrop", "RandomResizedCrop", "ColorJitter",
                 "ToPILImage", "ToTensor"):
        if not hasattr(tvt, name):
            setattr(tvt, name, type(name, (), {
                "__init__": lambda self, *a, **k: None}))
    if not hasattr(tvt, "Lambda"):
        class Lambda:  # torchvision.transforms.Lambda (func/train.py:558)
            def __init__(self, fn):
                self.fn = fn

            def __call__(self, x):
                return self.fn(x)

        tvt.Lambda = Lambda
    def _sub(parent, parent_name, attr):
        name = f"{parent_name}.{attr}"
        mod = getattr(parent, attr, None) or sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        setattr(parent, attr, mod)
        sys.modules[name] = mod
        return mod

    tv_datasets = _sub(tv, "torchvision", "datasets")
    tv_video_utils = _sub(tv_datasets, "torchvision.datasets", "video_utils")
    if not hasattr(tv_video_utils, "VideoClips"):
        tv_video_utils.VideoClips = type("VideoClips", (), {})
    tv_samplers = _sub(tv_datasets, "torchvision.datasets", "samplers")
    for name in ("DistributedSampler", "UniformClipSampler",
                 "RandomClipSampler"):
        if not hasattr(tv_samplers, name):
            setattr(tv_samplers, name, type(name, (), {}))
    if not hasattr(tv, "__version__"):
        tv.__version__ = "0.0-stub"


def _make_submitit_stub():
    submitit = types.ModuleType("submitit")

    class JobEnvironment:
        def __init__(self):
            raise RuntimeError("not inside a submitit job (stub)")

    submitit.JobEnvironment = JobEnvironment
    return {"submitit": submitit}


def _load_fake_lmdb():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "lmdb", os.path.join(os.path.dirname(__file__), "_fake_lmdb.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def install_stubs():
    """Idempotently install the dependency stubs and the reference path."""
    stubs = {}
    if "hydra" not in sys.modules:
        stubs.update(_make_hydra_stub())
    if "omegaconf" not in sys.modules:
        stubs.update(_make_omegaconf_stub())
    if "torchvision" not in sys.modules:
        stubs.update(_make_torchvision_stub())
    if "submitit" not in sys.modules:
        stubs.update(_make_submitit_stub())
    if "lmdb" not in sys.modules:
        stubs["lmdb"] = _load_fake_lmdb()
    # Pre-register the reference's top-level packages as namespace-only
    # modules pointing into REF_ROOT. This (a) skips func/__init__.py, which
    # imports func.train and drags in torchvision.datasets/tensorboard
    # machinery we don't stub, and (b) keeps the reference's `datasets`
    # package from colliding with HuggingFace `datasets` in site-packages.
    for pkg in ("func", "common", "datasets", "models", "loss_fn", "notebooks"):
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [f"{REF_ROOT}/{pkg}"]
            stubs[pkg] = mod
    for name, mod in stubs.items():
        if getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=hasattr(mod, "__path__"))
    sys.modules.update(stubs)


def install_notebook_stubs():
    """Extra stand-ins for notebooks/utils.py (reference offline analysis).

    h5py/scipy/matplotlib/seaborn/tqdm are real in this env; what's missing:
      * moviepy.editor / proglog (video rendering; only touched inside
        functions we don't call — except proglog.notebook() at import)
      * launch.subselect_dict_keys_diff (reference launch.py imports its
        full hydra/submitit stack; only summarize_results needs it)
      * external.rulstm.RULSTM.utils.topk_recall — the RULSTM submodule is
        NOT vendored in the reference checkout. We plug in avt_tpu's own
        topk_recall, so differential tests of compute_accuracy exercise the
        reference's class-selection/nan plumbing around a shared AR5 core
        (the core itself is pinned separately in test_analysis).
      * hydra.experimental.{initialize,compose} (import-time only)
    """
    install_stubs()
    stubs = {}
    if "moviepy" not in sys.modules:
        moviepy = types.ModuleType("moviepy")
        editor = types.ModuleType("moviepy.editor")
        moviepy.editor = editor
        stubs.update({"moviepy": moviepy, "moviepy.editor": editor})
    if "proglog" not in sys.modules:
        proglog = types.ModuleType("proglog")
        proglog.notebook = lambda *a, **k: None
        stubs["proglog"] = proglog
    if "launch" not in sys.modules:
        launch = types.ModuleType("launch")
        launch.subselect_dict_keys_diff = lambda run_id_param_dicts: [
            {} for _ in run_id_param_dicts
        ]
        stubs["launch"] = launch
    if "external.rulstm.RULSTM.utils" not in sys.modules:
        from avt_tpu.evaluate.metrics import topk_recall

        mods = {}
        for name in ("external", "external.rulstm", "external.rulstm.RULSTM"):
            mod = types.ModuleType(name)
            mod.__path__ = []
            mods[name] = mod
        utils_mod = types.ModuleType("external.rulstm.RULSTM.utils")
        utils_mod.topk_recall = topk_recall
        mods["external.rulstm.RULSTM.utils"] = utils_mod
        stubs.update(mods)
    hydra = sys.modules["hydra"]
    if not hasattr(hydra, "experimental"):
        exp = types.ModuleType("hydra.experimental")

        def _unavailable(*a, **k):
            raise RuntimeError("hydra.experimental stub: not runnable here")

        exp.initialize = _unavailable
        exp.compose = _unavailable
        hydra.experimental = exp
        stubs["hydra.experimental"] = exp
    for name, mod in stubs.items():
        if getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(
                name, None, is_package=hasattr(mod, "__path__")
            )
    sys.modules.update(stubs)


def import_ref(module: str):
    """Import a reference module (e.g. 'common.scheduler') with stubs in place."""
    install_stubs()
    if module.startswith("notebooks"):
        install_notebook_stubs()
    return importlib.import_module(module)
