"""Offline metrics/analysis differential against the reference's
notebooks/utils.py, imported directly via ref_harness (moviepy/proglog/
launch/RULSTM-submodule stubs; the absent RULSTM topk_recall is plugged
with avt_tpu's own implementation on BOTH sides, so these tests pin the
reference's class-selection / NaN / conf-mat plumbing around a shared
AR5 core — the core itself is pinned by fixtures in test_analysis).

Also round-trips an H5 results directory WRITTEN BY OUR evaluator sink
through the reference's own read_results/get_epoch_from_resdir readers:
proof the stored format is consumable by the upstream offline tooling.

Reference surfaces: notebooks/utils.py:91-160 (gen_load_resfiles,
read_results, get_epoch_from_resdir), :246-265 (compute_topk), :268-283
(combine_verb_noun_preds), :284-315 (compute_conf_mat,
mean_class_accuracy), :317-377 (compute_accuracy), :405-413
(get_logits_from_results), :516-562 (compute_accuracies_epic), :605-661
(load_json, _concat_with_uids, _normalize_scores).
"""
import json
from collections import OrderedDict

import numpy as np
import pandas as pd
import pytest
import torch

import ref_harness

from avt_tpu.evaluate import analysis as my_analysis
from avt_tpu.evaluate import metrics as my_metrics
from avt_tpu.evaluate import results as my_results

ref_nb = ref_harness.import_ref("notebooks.utils")

RNG = np.random.default_rng(202)


def _rand_logits(n, c):
    return RNG.normal(size=(n, c)).astype(np.float32)


# ----------------------------------------------------------- leaf metrics
@pytest.mark.parametrize("k", [1, 5])
@pytest.mark.parametrize("classes", [None, [0, 2, 5], [1]])
def test_compute_topk_vs_reference(k, classes):
    preds = _rand_logits(64, 10)
    labels = RNG.integers(0, 10, size=64)
    want = ref_nb.compute_topk(preds, labels, k, classes=classes)
    got = my_metrics.compute_topk(preds, labels, k, classes=classes)
    assert got == pytest.approx(want)


def test_conf_mat_and_mean_class_accuracy_vs_reference():
    preds = _rand_logits(80, 7)
    labels = RNG.integers(0, 7, size=80)
    want_cm = ref_nb.compute_conf_mat(
        torch.from_numpy(preds), torch.from_numpy(labels)
    )
    got_cm = my_metrics.compute_conf_mat(preds, labels)
    np.testing.assert_allclose(got_cm, want_cm.numpy())
    assert my_metrics.mean_class_accuracy(got_cm) == pytest.approx(
        ref_nb.mean_class_accuracy(want_cm)
    )


@pytest.mark.parametrize("classes", [
    None,
    OrderedDict([("a", 0), ("b", 3), ("c", 7)]),
    OrderedDict([("absent", 9)]),   # no sample of the class: NaN AR5 path
])
def test_compute_accuracy_vs_reference(classes):
    preds = _rand_logits(120, 10)
    labels = RNG.integers(0, 9, size=120)  # class 9 never appears
    want = ref_nb.compute_accuracy(preds, labels, classes=classes)
    got = my_metrics.compute_accuracy(preds, labels, classes=classes)
    np.testing.assert_allclose(got[:4], want[:4], equal_nan=True, rtol=1e-6)
    # per-class AR5: ours is filled; the reference's is NaN unless its
    # RULSTM submodule is patched for per-class mode — same keys though
    if classes is not None:
        assert set(got[4]) == set(
            int(c) for c in want[4]
        ) or list(got[4]) == list(want[4])


def test_compute_accuracy_empty_vs_reference():
    preds = np.zeros((0, 10), dtype=np.float32)
    labels = np.zeros((0,), dtype=np.int64)
    want = ref_nb.compute_accuracy(preds, labels)
    got = my_metrics.compute_accuracy(preds, labels)
    assert all(np.isnan(v) for v in want)
    assert all(np.isnan(v) for v in got)


def test_combine_verb_noun_preds_vs_reference():
    rv, rn = _rand_logits(32, 6), _rand_logits(32, 4)
    np.testing.assert_allclose(
        my_metrics.combine_verb_noun_preds(rv, rn),
        ref_nb.combine_verb_noun_preds(rv, rn),
        rtol=1e-5, atol=1e-7,
    )


# ------------------------------------------------- epic metric bundle
class _FakeDS:
    """Duck-typed dataset for compute_accuracies_epic (EPIC-55 flavor;
    the EK100 unseen/tail branch gets narration ids + csvs grafted on in
    test_epic100_unseen_tail_eval_vs_reference)."""

    version = 0.1

    def __init__(self, n=90):
        self.df = pd.DataFrame({
            "verb_class": RNG.integers(0, 5, size=n),
            "noun_class": RNG.integers(0, 6, size=n),
            "action_class": RNG.integers(0, 8, size=n),
        })
        self.classes_manyshot = {
            "verb": OrderedDict([("v0", 0), ("v3", 3)]),
            "action": OrderedDict([("a1", 1), ("a5", 5), ("a7", 7)]),
        }


def test_epic100_unseen_tail_eval_vs_reference(tmp_path, monkeypatch):
    """epic100_unseen_tail_eval diff (notebooks/utils.py:457-513). The
    reference calls pandas<2 read_csv(squeeze=True); a shim mapping that
    onto pandas-2 .squeeze('columns') lets the actual reference code run."""
    ds = _FakeDS()
    n = len(ds.df)
    ds.df["narration_id"] = [f"P{i//10:02d}_{i}" for i in range(n)]
    ds.rulstm_annotation_dir = str(tmp_path)
    ids = ds.df["narration_id"]
    subsets = {
        "validation_unseen_participants_ids.csv": ids[ids.str.startswith("P00")],
        "validation_tail_verbs_ids.csv": ids[::3],
        "validation_tail_nouns_ids.csv": ids[1::4],
        "validation_tail_actions_ids.csv": ids[2::5],
    }
    for name, sub in subsets.items():
        sub.to_csv(tmp_path / name, index=False, header=False)

    real_read_csv = pd.read_csv

    def read_csv_with_squeeze(*args, squeeze=False, **kwargs):
        df = real_read_csv(*args, **kwargs)
        return df.squeeze("columns") if squeeze else df

    monkeypatch.setattr(pd, "read_csv", read_csv_with_squeeze)
    probs = [_rand_logits(n, c) for c in (5, 6, 8)]
    want = ref_nb.epic100_unseen_tail_eval(probs, ds)
    got = my_analysis.epic100_unseen_tail_eval(probs, ds)
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(got[key], want[key], equal_nan=True,
                                   rtol=1e-6, err_msg=key)


def test_compute_accuracies_epic_vs_reference():
    ds = _FakeDS()
    probs = [_rand_logits(len(ds.df), c) for c in (5, 6, 8)]
    want = ref_nb.compute_accuracies_epic(probs, ds)
    got = my_analysis.compute_accuracies_epic(probs, ds)
    assert set(got) == set(want)
    for key in want:
        if key.endswith("_per_cls"):
            continue  # reference side NaN-filled (RULSTM submodule absent)
        np.testing.assert_allclose(
            got[key], want[key], equal_nan=True, rtol=1e-6, err_msg=key
        )


# ----------------------------------------------- H5 results round trip
def _write_results_dir(resdir, with_uid):
    """Two ranks; rank 1 re-predicts idx 2 and 3 (multi-pred mean path)."""
    logits = _rand_logits(8, 11)
    batches = [
        (0, [0, 1, 2, 3]),
        (1, [4, 5, 6, 7]),
        (1, [2, 3]),
    ]
    for rank, idxs in batches:
        ep = {
            "logits/action": logits[idxs] + 0.01 * RNG.normal(size=(len(idxs), 11)).astype(np.float32),
            "target/action": np.asarray(idxs, dtype=np.int64) % 7,
            "loss/cls": RNG.normal(size=(len(idxs),)).astype(np.float32),
            "idx": np.asarray(idxs, dtype=np.int64),
            "epoch": np.array([3.5]),
        }
        if with_uid:
            ep["uid"] = np.array([f"P01_{i}" for i in idxs])
        my_results.store_append_h5(ep, str(resdir), rank=rank)


def test_h5_results_readable_by_reference_tooling(tmp_path, monkeypatch):
    resdir = tmp_path / "conf" / "0" / "results"
    _write_results_dir(resdir, with_uid=False)
    monkeypatch.setattr(ref_nb, "OUTPUT_DIR", str(tmp_path))
    want = ref_nb.read_results("conf", 0, results_dir="results/")
    got = my_results.read_results(str(resdir))
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(
            got[key], want[key], rtol=1e-6, err_msg=key
        )
    assert my_results.get_epoch_from_resdir(str(resdir)) == pytest.approx(
        ref_nb.get_epoch_from_resdir("conf", 0, results_dir="results/")
    )
    np.testing.assert_allclose(
        my_results.get_logits_from_results(got),
        ref_nb.get_logits_from_results(want),
    )


def test_h5_uid_key_reference_reader_divergence(tmp_path, monkeypatch):
    """With the (always-stored) string uid key, the reference's own
    read_results crashes — np.mean over S64 bytes (notebooks/utils.py:
    146-148 vs func/train.py:374-384 which stores uids unconditionally).
    Ours mean-pools numeric keys only and passes uids through."""
    resdir = tmp_path / "conf" / "0" / "results"
    _write_results_dir(resdir, with_uid=True)
    monkeypatch.setattr(ref_nb, "OUTPUT_DIR", str(tmp_path))
    with pytest.raises(TypeError):
        ref_nb.read_results("conf", 0, results_dir="results/")
    got = my_results.read_results(str(resdir))
    assert got["uid"][2] == b"P01_2"
    assert got["logits/action"].shape == (8, 11)


# ---------------------------------------------- fusion/packaging helpers
def test_normalize_scores_vs_reference():
    scores = [
        {f"u{i}": RNG.normal(size=(7,)) for i in range(5)} for _ in range(3)
    ]
    for p in (1, 2):
        want = ref_nb._normalize_scores(scores, p)
        got = my_analysis.normalize_scores(scores, p)
        for w_space, g_space in zip(want, got):
            assert set(w_space) == set(g_space)
            for uid in w_space:
                np.testing.assert_allclose(g_space[uid], w_space[uid])


def test_concat_with_uids_vs_reference():
    ds = _FakeDS(n=6)
    ds.df["uid"] = [f"id{i}" for i in range(6)]
    scores = [_rand_logits(6, c) for c in (5, 6, 8)]
    want = ref_nb._concat_with_uids(scores, ds, "uid")
    got = my_analysis.scores_with_uids(scores, ds, "uid")
    for w_space, g_space in zip(want, got):
        assert list(w_space) == list(g_space)
        for uid in w_space:
            np.testing.assert_array_equal(g_space[uid], w_space[uid])


def test_load_external_json_vs_reference(tmp_path):
    verb_noun_to_action = {(0, 0): 0, (0, 1): 1, (1, 0): 2, (2, 1): 3}
    payload = {
        "results": {
            "P01_1": {
                "verb": {"0": 1.5, "2": 0.25},
                "noun": {"1": 0.75},
                "action": {"0,1": 2.0, "2,1": 0.5},
            },
            "P01_2": {
                "verb": {"1": 0.1},
                "noun": {"0": 0.9, "1": 0.05},
                "action": {"1,0": 1.25},
            },
        }
    }
    fpath = tmp_path / "seen.json"
    fpath.write_text(json.dumps(payload))
    nclasses = [3, 2, 4]
    want = ref_nb.load_json(str(fpath), verb_noun_to_action, nclasses)
    got = my_analysis.load_external_json(
        str(fpath), verb_noun_to_action, nclasses
    )
    for w_space, g_space in zip(want, got):
        assert set(w_space) == set(g_space)
        for uid in w_space:
            np.testing.assert_array_equal(g_space[uid], w_space[uid])
