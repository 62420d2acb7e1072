"""Challenge-submission golden diff vs the reference packager.

Races our evaluate.analysis.package_results_for_submission[_ek100]
against the reference's notebooks/utils.py:884-995 on SHARED synthetic
scores (the late-fuse stage is pinned separately in test_diff_metrics;
here it is bypassed identically on both sides so the diff isolates the
submission-structure logic: per-uid verb/noun dicts, top-100 action keys
as "verb,noun", discarded-uid zero rows, sls codes, zip layout).
"""
import json
import os
import zipfile
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

import ref_harness

from avt_tpu.evaluate import analysis as my_analysis

ref_nb = ref_harness.import_ref("notebooks.utils")

RNG = np.random.default_rng(77)
N_VERB, N_NOUN = 5, 20
N_ACT = N_VERB * N_NOUN  # >= 100 (the packagers take a top-100 partition)


def _fake_dataset(version, uids, discarded_uids, challenge):
    vn_to_a = {
        (v, n): v * N_NOUN + n for v in range(N_VERB) for n in range(N_NOUN)
    }
    return SimpleNamespace(
        verb_noun_to_action=vn_to_a,
        verb_classes={f"v{i}": i for i in range(N_VERB)},
        noun_classes={f"n{i}": i for i in range(N_NOUN)},
        version=version,
        challenge_type=challenge,
        discarded_df=pd.DataFrame({"uid": discarded_uids,
                                   "narration_id": discarded_uids}),
        df=pd.DataFrame({"uid": uids, "narration_id": uids}),
    )


def _combined(uids):
    return [
        {u: RNG.normal(size=(n,)).astype(np.float64) for u in uids}
        for n in (N_VERB, N_NOUN, N_ACT)
    ]


@pytest.mark.parametrize("challenge", ["action_anticipation"])
def test_ek55_submission_golden_diff(tmp_path, monkeypatch, challenge):
    uids_seen = [f"s{i}" for i in range(6)]
    uids_unseen = [f"u{i}" for i in range(4)]
    ds_seen = _fake_dataset("0.1", uids_seen, ["sd0", "sd1"], challenge)
    ds_unseen = _fake_dataset("0.1", uids_unseen, ["ud0"], challenge)
    comb_seen, comb_unseen = _combined(uids_seen), _combined(uids_unseen)

    # ---- reference leg: bypass late-fuse with the SAME combined scores
    def fake_late_fuse(run_infos, weights, dataset_key_suffix="",
                       uid_key="uid", eventual_fname="seen.json",
                       normalize_before_combine=None):
        if dataset_key_suffix == "_s2":
            return None, comb_unseen, ds_unseen
        return None, comb_seen, ds_seen

    monkeypatch.setattr(
        ref_nb, "get_epic_marginalize_late_fuse", fake_late_fuse)
    monkeypatch.setattr(ref_nb, "OUTPUT_DIR", str(tmp_path / "ref"))
    ref_nb.package_results_for_submission([("expt", 0)], weights=1.0)
    ref_dir = tmp_path / "ref" / "expt" / "0" / "challenge"

    # ---- our leg
    my_dir = tmp_path / "mine"
    my_analysis.package_results_for_submission(
        comb_seen, ds_seen, comb_unseen, ds_unseen, str(my_dir))

    for name in ("seen.json", "unseen.json"):
        ref_json = json.load(open(ref_dir / name))
        my_json = json.load(open(my_dir / name))
        assert my_json == ref_json, name
    # zip contents match (flat member names)
    for d in (ref_dir, my_dir):
        with zipfile.ZipFile(d / "submit.zip") as zf:
            assert sorted(zf.namelist()) == ["seen.json", "unseen.json"]


def test_ek100_submission_golden_diff(tmp_path, monkeypatch):
    uids = [f"P01_101_{i}" for i in range(8)]
    ds = _fake_dataset("0.2", uids, ["P01_101_90"], "action_anticipation")
    comb = _combined(uids)

    def fake_late_fuse(run_infos, weights, dataset_key_suffix="",
                       uid_key="uid", eventual_fname="seen.json",
                       normalize_before_combine=None):
        assert uid_key == "narration_id"  # the EK100 packager contract
        return None, comb, ds

    monkeypatch.setattr(
        ref_nb, "get_epic_marginalize_late_fuse", fake_late_fuse)
    monkeypatch.setattr(ref_nb, "OUTPUT_DIR", str(tmp_path / "ref"))
    ref_nb.package_results_for_submission_ek100(
        [("expt", 0)], weights=1.0, sls=[1, 4, 4])
    ref_json = json.load(
        open(tmp_path / "ref" / "expt" / "0" / "challenge" / "test.json"))

    my_dir = tmp_path / "mine"
    my_analysis.package_results_for_submission_ek100(
        comb, ds, str(my_dir), sls=(1, 4, 4))
    my_json = json.load(open(my_dir / "test.json"))
    assert my_json == ref_json
    assert my_json["sls_pt"] == 1 and my_json["sls_td"] == 4
    with zipfile.ZipFile(my_dir / "submit.zip") as zf:
        assert zf.namelist() == ["test.json"]


def test_submission_readback_through_reference_loader(tmp_path, monkeypatch):
    """Our test.json round-trips through the reference's load_json (the
    path its late-fusion uses to ingest external submission files):
    top-100 action scores land on the right action ids."""
    uids = [f"x{i}" for i in range(5)]
    ds = _fake_dataset("0.2", uids, [], "action_anticipation")
    comb = _combined(uids)
    my_dir = tmp_path / "mine"
    my_analysis.package_results_for_submission_ek100(
        comb, ds, str(my_dir), sls=(1, 4, 4))
    loaded = ref_nb.load_json(
        os.path.join(my_dir, "test.json"), ds.verb_noun_to_action,
        [N_VERB, N_NOUN, N_ACT],
    )
    for u in uids:
        np.testing.assert_allclose(loaded[0][u], comb[0][u], rtol=1e-6)
        np.testing.assert_allclose(loaded[1][u], comb[1][u], rtol=1e-6)
        # actions: only the top-100 (= all here) survive
        np.testing.assert_allclose(loaded[2][u], comb[2][u], rtol=1e-6)
