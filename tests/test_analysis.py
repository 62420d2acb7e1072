"""Marginalization / late fusion / submission packaging tests."""
import json
import os
import zipfile

import numpy as np
import pandas as pd
import pytest

from avt_tpu.data import NpyFeatsReader, convert_to_anticipation
from avt_tpu.data.epic_kitchens import EPIC100_VERSION, EpicKitchens
from avt_tpu.evaluate.analysis import (
    compute_accuracies_epic,
    get_marginalized_scores,
    late_fuse,
    load_external_json,
    package_results_for_submission_ek100,
    scores_with_uids,
    struct_outputs,
)
from avt_tpu.evaluate.results import store_append_h5

RNG = np.random.default_rng(11)
N_V, N_N, N_A = 3, 2, 6


@pytest.fixture
def ds(tmp_path):
    annot = tmp_path / "annot"
    annot.mkdir()
    (annot / "EPIC_100_verb_classes.csv").write_text(
        "id,key\n" + "\n".join(f"{i},v{i}" for i in range(N_V))
    )
    (annot / "EPIC_100_noun_classes.csv").write_text(
        "id,key\n" + "\n".join(f"{i},n{i}" for i in range(N_N))
    )
    (annot / "actions.csv").write_text(
        "id,verb,noun,action\n"
        + "\n".join(f"{i},{i % N_V},{i % N_N},a{i}" for i in range(N_A))
    )
    rows = [
        f"{100+i},P01_01,{600+i*300},{690+i*300},{i % N_V},{i % N_N},{i % N_A}"
        for i in range(12)
    ]
    (annot / "val.csv").write_text("\n".join(rows))
    feats = tmp_path / "feats"
    feats.mkdir()
    np.save(feats / "P01_01.npy",
            RNG.normal(size=(6000, 8)).astype(np.float32))
    return EpicKitchens(
        annotation_path=[str(annot / "val.csv")],
        action_labels_fpath=str(annot / "actions.csv"),
        annotation_dir=str(annot),
        version=EPIC100_VERSION,
        root=str(feats),
        frames_per_clip=4,
        frame_rate=1.0,
        reader=NpyFeatsReader(str(feats), read_type="normal"),
        label_type=["verb", "noun", "action"],
        sample_strategy="last_clip",
        conv_to_anticipate_fn=lambda d: convert_to_anticipation(d, 1.0, 10.0),
    )


def _perfect_action_scores(ds):
    labels = ds.df.action_class.values
    scores = np.full((len(labels), N_A), -5.0, np.float32)
    scores[np.arange(len(labels)), labels] = 5.0
    return scores


def test_marginalization_from_stored_results(ds, tmp_path):
    resdir = str(tmp_path / "results")
    scores = _perfect_action_scores(ds)
    store_append_h5(
        {
            "logits/action": scores,
            "idx": np.arange(len(ds.df)),
            "uid": ds.df.uid.values.astype("U"),
            "target/action": ds.df.action_class.values,
        },
        resdir,
    )
    accs, sc = get_marginalized_scores(resdir, ds)
    # perfect action scores -> perfect marginalized verb/noun too
    assert accs["atop1"] == 100.0
    assert accs["vtop1"] == 100.0 and accs["ntop1"] == 100.0
    assert accs["arec5"] == 100.0
    assert sc[0].shape == (len(ds.df), N_V)


def test_late_fuse_weights(ds):
    good = scores_with_uids(
        [np.eye(N_V)[ds.df.verb_class.values] * 4,
         np.eye(N_N)[ds.df.noun_class.values] * 4,
         _perfect_action_scores(ds)], ds)
    # adversarial scores: uniform wrong
    bad_action = np.roll(_perfect_action_scores(ds), 1, axis=1)
    bad = scores_with_uids(
        [np.ones((len(ds.df), N_V)), np.ones((len(ds.df), N_N)), bad_action],
        ds,
    )
    accs, combined = late_fuse([good, bad], weights=[2.0, 0.5], dataset=ds)
    assert accs["atop1"] == 100.0  # good scores dominate at weight 2.0
    assert set(combined[2].keys()) == {str(u) for u in ds.df.uid.values}


def test_struct_outputs_and_packaging(ds, tmp_path):
    scores = scores_with_uids(
        [RNG.normal(size=(len(ds.df), N_V)),
         RNG.normal(size=(len(ds.df), N_N)),
         RNG.normal(size=(len(ds.df), N_A))], ds)
    _, combined = late_fuse([scores], dataset=None)
    out = struct_outputs(combined, ds)
    assert out["challenge"] == "action_anticipation"
    uid0 = str(ds.df.uid.values[0])
    entry = out["results"][uid0]
    assert len(entry["verb"]) == N_V
    # action keys are 'verb,noun' pairs
    assert all("," in k for k in entry["action"])

    outdir = str(tmp_path / "challenge")
    package_results_for_submission_ek100(combined, ds, outdir, uid_key="uid")
    with open(os.path.join(outdir, "test.json")) as fin:
        loaded = json.load(fin)
    assert loaded["sls_pt"] == 1
    with zipfile.ZipFile(os.path.join(outdir, "submit.zip")) as zf:
        assert "test.json" in zf.namelist()


def test_load_external_json_roundtrip(ds, tmp_path):
    scores = scores_with_uids(
        [softmax(RNG.normal(size=(len(ds.df), N_V))),
         softmax(RNG.normal(size=(len(ds.df), N_N))),
         softmax(RNG.normal(size=(len(ds.df), N_A)))], ds)
    _, combined = late_fuse([scores], dataset=None)
    out = struct_outputs(combined, ds)
    fpath = tmp_path / "ext.json"
    fpath.write_text(json.dumps(out))
    loaded = load_external_json(
        str(fpath), ds.verb_noun_to_action, [N_V, N_N, N_A]
    )
    uid0 = str(ds.df.uid.values[0])
    np.testing.assert_allclose(loaded[0][uid0], combined[0][uid0], rtol=1e-6)
    np.testing.assert_allclose(loaded[2][uid0], combined[2][uid0], rtol=1e-6)


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_plot_per_cls_perf(tmp_path):
    """Per-class gain plot (reference notebooks/utils.py:801-881): picks the
    top-N classes the last method improves over the first, renders + saves."""
    from avt_tpu.evaluate.analysis import plot_per_cls_perf

    base = [{0: 10.0, 1: 50.0, 2: 30.0}, {0: 12.0, 1: 48.0, 2: 30.0}]
    ours = [{0: 40.0, 1: 50.0, 2: 35.0}, {0: 42.0, 1: 52.0, 2: 35.0}]
    out = tmp_path / "figs" / "verb.pdf"
    fig, gained = plot_per_cls_perf(
        [base, ours], ["baseline", "avt_tpu"],
        cls_id_to_name={0: "take", 1: "put", 2: "open"},
        show_topn=2, outfpath=str(out),
    )
    # class 0 gains +30, class 2 gains +5, class 1 gains +2 -> top-2 ordered
    assert gained == ["open", "take"]
    assert out.exists() and out.stat().st_size > 0
    # show_subset filters before the top-N cut
    _, gained2 = plot_per_cls_perf(
        [base, ours], ["baseline", "avt_tpu"],
        cls_id_to_name={0: "take", 1: "put", 2: "open"},
        show_topn=2, show_subset=lambda n: n != "take",
    )
    assert "take" not in gained2


def test_compute_accuracy_per_class_recall_values():
    """Per-class AR5 carries REAL per-class recalls (RULSTM per-class mode,
    reference notebooks/utils.py:343-344), not NaN placeholders."""
    from avt_tpu.evaluate.metrics import compute_accuracy

    # class 0: always ranked top-1; class 1: never in the top-5 of 6
    n, C = 8, 6
    preds = np.zeros((n, C), np.float32)
    labels = np.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    preds[:4, 0] = 10.0  # class-0 rows: correct
    preds[4:, :] = np.asarray([5, 0, 4, 3, 2, 1])  # class-1 rows: 1 ranked last
    _, _, ar5, _, per_cls = compute_accuracy(preds, labels)
    assert per_cls[0] == pytest.approx(100.0)
    assert per_cls[1] == pytest.approx(0.0)
    assert ar5 == pytest.approx(50.0)


def test_get_epic_action_accuracy_two_runs(ds, tmp_path):
    """Separate verb and noun runs combine into action metrics via the
    softmax outer product (notebooks/utils.py:416-456)."""
    from avt_tpu.evaluate.analysis import (
        format_accuracies_epic,
        get_epic_action_accuracy,
    )
    from avt_tpu.evaluate.results import (
        get_epoch_from_resdir,
        get_logits_from_results,
        read_results,
    )

    n = len(ds.df)
    vdir, ndir = str(tmp_path / "rv"), str(tmp_path / "rn")
    v_scores = np.eye(N_V, dtype=np.float32)[ds.df.verb_class.values] * 6
    n_scores = np.eye(N_N, dtype=np.float32)[ds.df.noun_class.values] * 6
    store_append_h5(
        {"logits/verb": v_scores, "idx": np.arange(n),
         "epoch": np.full(n, 3.5)}, vdir,
    )
    store_append_h5({"logits/noun": n_scores, "idx": np.arange(n)}, ndir)

    assert get_epoch_from_resdir(vdir) == 3.5
    assert get_epoch_from_resdir(ndir) is None
    assert get_logits_from_results(read_results(vdir)).shape == (n, N_V)

    out = get_epic_action_accuracy(vdir, ds, ndir, ds)
    # perfect verb+noun scores -> perfect action over the v*n grid
    assert out["vtop1"] == 100.0 and out["ntop1"] == 100.0
    assert out["atop1"] == 100.0
    assert np.isnan(out["arec5_ms"])
    lines = format_accuracies_epic(out, "test")
    assert lines[0].startswith("[test] Accuracies verb/noun/action: 100.0")
    assert len(lines) == 4  # no tail/unseen keys here


def test_save_graph_and_overlay_text(tmp_path):
    """Notebook figure helpers (reference notebooks/utils.py:63-73 save_graph,
    :232-244 overlay_text): despine+save to a nested path; GT/Pred banner
    white on match, pink on mismatch, frames otherwise untouched."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from avt_tpu.evaluate.analysis import overlay_text, save_graph

    fig, ax = plt.subplots()
    ax.plot([0, 1], [1, 0])
    out = save_graph(fig, "figs/nested/a.pdf", root_dir=str(tmp_path))
    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert not ax.spines["top"].get_visible()
    assert not ax.spines["right"].get_visible()
    plt.close(fig)

    frames = np.zeros((3, 64, 96, 3), np.uint8)
    ok = overlay_text(frames, ["take plate", "take plate"])
    bad = overlay_text(frames, ["take plate", "wash knife"])
    assert ok.shape == frames.shape and frames.max() == 0  # input untouched
    # banner color present (glyphs overprint parts of it): white vs pink;
    # non-banner region untouched
    assert (ok == 255).all(axis=-1).any()
    assert (bad == np.array([255, 192, 203])).all(axis=-1).any()
    assert not (ok == np.array([255, 192, 203])).all(axis=-1).any()
    assert (ok[:, 40:, :40] == 0).all()
    assert (bad[:, 40:, :40] == 0).all()
