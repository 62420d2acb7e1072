"""Offline analysis: marginalization, late fusion, challenge packaging.

Parity target: reference notebooks/utils.py
  * compute_accuracies_epic / epic100_unseen_tail_eval (:420-560): the full
    verb/noun/action metric bundle incl. many-shot, tail and unseen-
    participant recall splits from the RULSTM id csvs.
  * get_epic_marginalize_verb_noun (:565-591): derive verb/noun scores from
    action probabilities via the dataset's mapping matrices (unless the run
    already stored verb/noun logits).
  * get_epic_marginalize_late_fuse (:670-758): weighted score fusion across
    runs keyed by uid, with optional p-norm normalization and external
    json/pkl score imports.
  * package_results_for_submission[_ek100] (:884-995): EPIC challenge jsons
    (top-100 actions as 'verb,noun' keys, uniform scores for discarded
    uids, sls codes) + submit.zip.

API difference from the reference: functions take result DIRECTORIES (or
in-memory score dicts) plus dataset objects, not hydra conf paths.
"""
from __future__ import annotations

import json
import logging
import os
import os.path as osp
import pickle as pkl
import zipfile
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from avt_tpu.evaluate.metrics import (
    combine_verb_noun_preds,
    compute_accuracy,
    softmax_np,
)
from avt_tpu.evaluate.results import get_logits_from_results, read_results

LOG = logging.getLogger(__name__)


# ----------------------------------------------------------- epic metrics
def compute_accuracies_epic(probs: Sequence[np.ndarray], dataset) -> Dict:
    """Full verb/noun/action metric bundle for EPIC datasets.

    probs: [verb (N, Cv), noun (N, Cn), action (N, Ca)] scores aligned with
    dataset.df rows.
    """
    manyshot = dataset.classes_manyshot
    out = {}
    for pfx, scores, col in (
        ("v", probs[0], "verb_class"),
        ("n", probs[1], "noun_class"),
        ("a", probs[2], "action_class"),
    ):
        labels = dataset.df[col].values
        top1, top5, rec5, top1_meancls, rec5_per_cls = compute_accuracy(
            scores, labels
        )
        task = {"v": "verb", "n": "noun", "a": "action"}[pfx]
        rec5_ms = float("nan")
        if task in manyshot:
            _, _, rec5_ms, _, _ = compute_accuracy(
                scores, labels, manyshot[task]
            )
        out.update(
            {
                f"{pfx}top1": top1,
                f"{pfx}top5": top5,
                f"{pfx}rec5": rec5,
                f"{pfx}rec5_ms": rec5_ms,
                f"{pfx}top1_meancls": top1_meancls,
                f"{pfx}rec5_per_cls": rec5_per_cls,
            }
        )
    # EK100 tail/unseen splits when the RULSTM id csvs are available
    rulstm_dir = getattr(dataset, "rulstm_annotation_dir", None)
    if (
        rulstm_dir
        and getattr(dataset, "version", None) == 0.2
        and osp.exists(
            osp.join(rulstm_dir, "validation_unseen_participants_ids.csv")
        )
        and "narration_id" in dataset.df.columns
    ):
        out.update(epic100_unseen_tail_eval(probs, dataset))
    return out


def epic100_unseen_tail_eval(probs: Sequence[np.ndarray], dataset) -> Dict:
    """Recall@5 on EK100 tail-class and unseen-participant subsets."""
    rdir = dataset.rulstm_annotation_dir

    def _ids(name):
        return pd.read_csv(osp.join(rdir, name), names=["id"])["id"]

    unseen = dataset.df.narration_id.isin(
        _ids("validation_unseen_participants_ids.csv")
    ).values
    masks = {
        "v": dataset.df.narration_id.isin(
            _ids("validation_tail_verbs_ids.csv")).values,
        "n": dataset.df.narration_id.isin(
            _ids("validation_tail_nouns_ids.csv")).values,
        "a": dataset.df.narration_id.isin(
            _ids("validation_tail_actions_ids.csv")).values,
    }
    cols = {"v": "verb_class", "n": "noun_class", "a": "action_class"}
    out = {}
    for i, pfx in enumerate("vna"):
        labels = dataset.df[cols[pfx]].values
        _, _, tail, _, _ = compute_accuracy(
            probs[i][masks[pfx]], labels[masks[pfx]]
        )
        _, _, uns, _, _ = compute_accuracy(probs[i][unseen], labels[unseen])
        out[f"{pfx}rec5_tail"] = tail
        out[f"{pfx}rec5_unseen"] = uns
    return out


def format_accuracies_epic(metrics: Dict, prefix: str = "") -> List[str]:
    """The reference's EPIC metric report lines (notebooks/utils.py:379-402)."""
    lines = [
        f"[{prefix}] Accuracies verb/noun/action: "
        f"{metrics['vtop1']:.1f} {metrics['vtop5']:.1f} "
        f"{metrics['ntop1']:.1f} {metrics['ntop5']:.1f} "
        f"{metrics['atop1']:.1f} {metrics['atop5']:.1f}",
        f"[{prefix}] Mean class top-1 accuracies verb/noun/action: "
        f"{metrics['vtop1_meancls']:.1f} {metrics['ntop1_meancls']:.1f} "
        f"{metrics['atop1_meancls']:.1f}",
        f"[{prefix}] Recall@5 verb/noun/action: "
        f"{metrics['vrec5']:.1f} {metrics['nrec5']:.1f} "
        f"{metrics['arec5']:.1f}",
        f"[{prefix}] Recall@5 many shot verb/noun/action: "
        f"{metrics['vrec5_ms']:.1f} {metrics['nrec5_ms']:.1f} "
        f"{metrics['arec5_ms']:.1f}",
    ]
    if "vrec5_tail" in metrics:  # EK100: tail/unseen computed together
        lines += [
            f"[{prefix}] Recall@5 tail verb/noun/action: "
            f"{metrics['vrec5_tail']:.1f} {metrics['nrec5_tail']:.1f} "
            f"{metrics['arec5_tail']:.1f}",
            f"[{prefix}] Recall@5 unseen verb/noun/action: "
            f"{metrics['vrec5_unseen']:.1f} {metrics['nrec5_unseen']:.1f} "
            f"{metrics['arec5_unseen']:.1f}",
        ]
    return lines


def print_accuracies_epic(metrics: Dict, prefix: str = "") -> None:
    for line in format_accuracies_epic(metrics, prefix):
        print(line)


def get_epic_action_accuracy(
    verb_resdir: str, verb_dataset, noun_resdir: str, noun_dataset
) -> Dict:
    """Action metrics implied by separate verb and noun runs: softmax outer
    product of the two runs' logits scores the verb x noun action grid
    (notebooks/utils.py:416-456 — the EGTEA-style two-head eval). Returns
    the same metric-key bundle as compute_accuracies_epic (many-shot slots
    are NaN, as in the reference)."""
    res_verb = get_logits_from_results(read_results(verb_resdir))
    res_noun = get_logits_from_results(read_results(noun_resdir))
    if isinstance(res_verb, dict) or isinstance(res_noun, dict):
        raise ValueError(
            "get_epic_action_accuracy needs single-task runs; got multiple "
            f"logits keys (verb: {sorted(res_verb) if isinstance(res_verb, dict) else 'ok'}, "
            f"noun: {sorted(res_noun) if isinstance(res_noun, dict) else 'ok'})"
        )
    assert (
        len(verb_dataset.df) == len(res_verb)
        == len(noun_dataset.df) == len(res_noun)
    )
    out = {}
    for pfx, scores, ds, col in (
        ("v", res_verb, verb_dataset, "verb_class"),
        ("n", res_noun, noun_dataset, "noun_class"),
    ):
        top1, top5, rec5, top1_meancls, rec5_per_cls = compute_accuracy(
            scores, ds.df[col].values
        )
        out.update({
            f"{pfx}top1": top1, f"{pfx}top5": top5, f"{pfx}rec5": rec5,
            f"{pfx}rec5_ms": float("nan"),
            f"{pfx}top1_meancls": top1_meancls,
            f"{pfx}rec5_per_cls": rec5_per_cls,
        })
    res_action = combine_verb_noun_preds(res_verb, res_noun)
    # stride by the noun CLASS count (reference notebooks/utils.py:430-432;
    # its literal len(dataset_noun.classes) counts label TYPES — the
    # obvious intent is the noun vocab size); logits columns must agree or
    # the flat action ids would silently mis-index
    cls = noun_dataset.classes
    num_noun = (
        len(cls["noun"]) if isinstance(cls, dict) and "noun" in cls
        else res_noun.shape[1]
    )
    assert res_noun.shape[1] == num_noun, (
        f"noun logits have {res_noun.shape[1]} columns but the dataset has "
        f"{num_noun} noun classes"
    )
    true_action = (
        verb_dataset.df["verb_class"].values * num_noun
        + noun_dataset.df["noun_class"].values
    )
    atop1, atop5, arec5, atop1_meancls, arec5_per_cls = compute_accuracy(
        res_action, true_action
    )
    out.update({
        "atop1": atop1, "atop5": atop5, "arec5": arec5,
        "arec5_ms": float("nan"), "atop1_meancls": atop1_meancls,
        "arec5_per_cls": arec5_per_cls,
    })
    for line in format_accuracies_epic(out):
        LOG.info("%s", line)
    return out


# -------------------------------------------------------- marginalization
def get_marginalized_scores(resdir: str, dataset):
    """Verb/noun/action scores for a run, marginalizing if needed.

    Returns (accuracies dict, [verb, noun, action] ndarray scores).
    """
    results = read_results(resdir)
    logits_keys = [k for k in results if k.startswith("logits/")]
    if {"logits/verb", "logits/noun", "logits/action"} <= set(logits_keys):
        res_verb = results["logits/verb"]
        res_noun = results["logits/noun"]
        res_action = results["logits/action"]
    else:
        res_action = results["logits/action"]
        probs = softmax_np(res_action)
        cm = dataset.class_mappings
        res_verb = probs @ np.asarray(cm[("verb", "action")])
        res_noun = probs @ np.asarray(cm[("noun", "action")])
    scores = [res_verb, res_noun, res_action]
    accuracies = compute_accuracies_epic(scores, dataset)
    return accuracies, scores


def scores_with_uids(scores: Sequence[np.ndarray], dataset, uid_key="uid"):
    """[array, ...] -> [{uid: row}, ...] keyed by dataset uids."""
    uids = [str(el) for el in dataset.df[uid_key].values]
    return [dict(zip(uids, space)) for space in scores]


# ------------------------------------------------------------ late fusion
def normalize_scores(scores, p):
    return [
        {
            uid: val / (np.linalg.norm(val, ord=p, axis=-1) + 1e-6)
            for uid, val in space.items()
        }
        for space in scores
    ]


def load_external_json(fpath, verb_noun_to_action, nclasses):
    """EPIC-format submission json -> [{uid: scores}, ...] (:605-640)."""
    with open(fpath, "r") as fin:
        preds = json.load(fin)
    all_res = []
    for j, space in enumerate(["verb", "noun", "action"]):
        res = {}
        for key, val in preds["results"].items():
            scores = np.zeros((nclasses[j],))
            for i, score in val[space].items():
                if space == "action":
                    idx = verb_noun_to_action[
                        tuple(int(el) for el in i.split(","))
                    ]
                else:
                    idx = int(i)
                scores[idx] = score
            res[key] = scores
        all_res.append(res)
    return all_res


def load_external_pkl(fpath):
    with open(fpath, "rb") as fin:
        scores = pkl.load(fin)
    return [
        scores["verb_scores"], scores["noun_scores"], scores["action_scores"]
    ]


def late_fuse(
    all_scores: Sequence[Sequence[Dict[str, np.ndarray]]],
    weights: Union[float, Sequence[float]] = 1.0,
    dataset=None,
    uid_key: str = "uid",
    normalize_before_combine: Optional[int] = None,
):
    """Weighted late fusion of per-uid scores across runs.

    all_scores: one [{uid: verb}, {uid: noun}, {uid: action}] triple per run.
    Returns (accuracies or None, combined [{uid: scores}, ...]).
    """
    if isinstance(weights, float):
        weights = [weights] * len(all_scores)
    assert len(weights) == len(all_scores)
    if normalize_before_combine is not None:
        all_scores = [
            normalize_scores(s, normalize_before_combine) for s in all_scores
        ]
    combined = []
    for space_id in range(3):
        per_run = [scores[space_id] for scores in all_scores]
        total_uids = set.union(*[set(el.keys()) for el in per_run])
        combined_for_space = {}
        for uid in total_uids:
            parts = [
                run[uid] * w
                for run, w in zip(per_run, weights)
                if uid in run
            ]
            combined_for_space[uid] = np.sum(np.stack(parts), axis=0)
        combined.append(combined_for_space)
    accuracies = None
    if dataset is not None:
        combined_np = [
            np.asarray(
                [space[str(uid)] for uid in dataset.df[uid_key].values]
            )
            for space in combined
        ]
        accuracies = compute_accuracies_epic(combined_np, dataset)
    return accuracies, combined


# --------------------------------------------------- challenge packaging
def struct_outputs(combined, dataset, uid_key="uid") -> Dict:
    """EPIC submission dict: per-uid verb/noun dicts + top-100 actions."""
    results = {}
    action_to_verb_noun = {
        val: key for key, val in dataset.verb_noun_to_action.items()
    }
    for uid in combined[0].keys():
        verb_res = {f"{j}": float(v) for j, v in enumerate(combined[0][uid])}
        noun_res = {f"{j}": float(v) for j, v in enumerate(combined[1][uid])}
        act = combined[2][uid]
        topn = min(100, act.shape[-1])
        top100 = sorted(
            np.argpartition(act, -topn)[-topn:], key=lambda x: -act[x]
        )
        action_res = {
            ",".join(str(el) for el in action_to_verb_noun[j]): float(act[j])
            for j in top100
        }
        results[f"{uid}"] = {
            "verb": verb_res, "noun": noun_res, "action": action_res
        }
    # discarded (un-anticipatable) uids get uniform scores
    if dataset.discarded_df is not None:
        for _, row in dataset.discarded_df.iterrows():
            if str(row[uid_key]) in results:
                continue
            results[f"{row[uid_key]}"] = {
                "verb": {f"{j}": 0.0 for j in range(len(dataset.verb_classes))},
                "noun": {f"{j}": 0.0 for j in range(len(dataset.noun_classes))},
                "action": {f"0,{j}": 0.0 for j in range(100)},
            }
    return {
        "version": f"{dataset.version}",
        "challenge": dataset.challenge_type,
        "results": results,
    }


def _write_zip(output_dir: str, fnames: Sequence[str]):
    with zipfile.ZipFile(osp.join(output_dir, "submit.zip"), "w") as zf:
        for fname in fnames:
            zf.write(osp.join(output_dir, fname), arcname=fname)


def package_results_for_submission(
    seen_combined, seen_dataset, unseen_combined, unseen_dataset, output_dir
):
    """EK55 challenge: seen.json + unseen.json + submit.zip."""
    os.makedirs(output_dir, exist_ok=True)
    for name, combined, ds in (
        ("seen.json", seen_combined, seen_dataset),
        ("unseen.json", unseen_combined, unseen_dataset),
    ):
        with open(osp.join(output_dir, name), "w") as fout:
            json.dump(struct_outputs(combined, ds), fout, indent=4)
    _write_zip(output_dir, ["seen.json", "unseen.json"])


def package_results_for_submission_ek100(
    combined, dataset, output_dir, sls=(1, 4, 4), uid_key="narration_id"
):
    """EK100 challenge: test.json with sls codes + submit.zip."""
    os.makedirs(output_dir, exist_ok=True)
    res = struct_outputs(combined, dataset, uid_key=uid_key)
    res["sls_pt"], res["sls_tl"], res["sls_td"] = sls
    with open(osp.join(output_dir, "test.json"), "w") as fout:
        json.dump(res, fout, indent=4)
    _write_zip(output_dir, ["test.json"])


# ----------------------------------------------------------- summarizer
def summarize_results(
    expt_file: str,
    output_root: str = "OUTPUTS",
    metric: str = "arec5",
    dataset_fn=None,
):
    """Mean/std of a metric across the sweep run_ids of an experiment.

    dataset_fn(run_id) must build the eval dataset for marginalization.
    Skips runs with no/empty results (unfinished trainings).
    """
    from avt_tpu.config.overrides import parse_overrides_file, expand_sweeps

    variants = expand_sweeps(parse_overrides_file(expt_file))
    expt = os.path.splitext(os.path.basename(expt_file))[0]
    by_params: Dict = {}
    for run_id, variant in enumerate(variants):
        resdir = osp.join(output_root, expt, str(run_id), "results")
        try:
            dataset = dataset_fn(run_id)
            accuracies, _ = get_marginalized_scores(resdir, dataset)
        except (FileNotFoundError, ValueError, KeyError) as err:
            LOG.warning("Skipping run %d: %s", run_id, err)
            continue
        params = tuple(
            sorted(
                f"{o.key}={o.value}" for o in variant if o.key != "run_id"
            )
        )
        by_params.setdefault(params, {})[run_id] = accuracies[metric]
    summary = {}
    for params, runs in by_params.items():
        vals = list(runs.values())
        summary[params] = {
            "runs": sorted(runs),
            "values": vals,
            "mean": float(np.mean(vals)),
            "std": float(np.std(vals)),
        }
    return summary


# ------------------------------------------------------ per-class plots
def save_graph(fig, outfpath: str, root_dir: str = "./", **kwargs):
    """Figure post-process + save (reference notebooks/utils.py:63-73):
    despine top/right, tight transparent bbox, mkdir -p the target."""
    try:
        import seaborn as sns

        sns.despine(fig=fig, top=True, right=True, left=False, bottom=False)
    except ImportError:  # same despine by hand
        for ax in fig.axes:
            ax.spines["top"].set_visible(False)
            ax.spines["right"].set_visible(False)
    final = os.path.join(root_dir, outfpath)
    os.makedirs(osp.dirname(final) or ".", exist_ok=True)
    fig.savefig(final, bbox_inches="tight", transparent=True, pad_inches=0,
                **kwargs)
    return final


def overlay_text(frames: np.ndarray, texts: Sequence[str]) -> np.ndarray:
    """Burn GT/Pred labels into clip frames (reference notebooks/
    utils.py:232-244): white banner when the prediction matches the
    ground truth, pink when it doesn't. The reference composes moviepy
    TextClips; this env has no moviepy, so the same banner is drawn
    directly on the (T, H, W, 3) uint8 frames (cv2 if present, else a
    plain banner without glyphs). Returns a new array."""
    assert len(texts) == 2, "pass [gt, pred]"
    match = texts[0] == texts[1]
    color = (255, 255, 255) if match else (255, 192, 203)  # white / pink
    labels = [f"GT: {texts[0]}", f"Pred: {texts[1]}"]
    out = np.array(frames, copy=True)
    banner_h = max(14, out.shape[1] // 8)
    out[:, : 2 * banner_h, -out.shape[2] // 2:] = color
    try:
        import cv2

        scale = banner_h / 32.0
        for t in range(out.shape[0]):
            for li, label in enumerate(labels):
                cv2.putText(
                    out[t], label,
                    (out.shape[2] - out.shape[2] // 2 + 2,
                     int((li + 0.8) * banner_h)),
                    cv2.FONT_HERSHEY_SIMPLEX, scale, (0, 0, 0), 1,
                    cv2.LINE_AA,
                )
    except ImportError:
        logging.getLogger(__name__).warning(
            "cv2 unavailable: overlay banner drawn without text glyphs")
    return out


def plot_per_cls_perf(
    per_cls_accs: Sequence[Sequence[Dict[int, float]]],
    names: Sequence[str],
    *,
    cls_id_to_name: Optional[Dict[int, str]] = None,
    show_topn: int = 10,
    show_subset=None,
    xticks_rotation: float = 0.0,
    ylabel: str = "Recall @ 5",
    outfpath: Optional[str] = None,
):
    """Bar chart of per-class accuracy for the classes the LAST method
    improves most over the FIRST (reference notebooks/utils.py:801-881).

    per_cls_accs: one list per method, each a list of per-run
    {cls_id: accuracy} dicts (e.g. the 'vrec5_per_cls' entry of
    compute_accuracies_epic for each run_id of a sweep).

    Returns (figure, gained_class_names); saves a PDF when outfpath is set.
    matplotlib imports lazily so headless training never pays for it.
    """
    assert len(per_cls_accs) == len(names)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cls_id_to_name = cls_id_to_name or {}
    rows = []  # (method, run_id, cls_name, acc)
    for name, runs in zip(names, per_cls_accs):
        for run_id, accs in enumerate(runs):
            for cls_id, score in accs.items():
                rows.append(
                    (name, run_id, cls_id_to_name.get(cls_id, str(cls_id)),
                     float(score))
                )
    df = pd.DataFrame(rows, columns=["method", "run_id", "cls_name", "acc"])
    mean_by_cls = (
        df.groupby(["method", "cls_name"])["acc"].mean().reset_index()
    )
    first = mean_by_cls[mean_by_cls.method == names[0]]
    last = mean_by_cls[mean_by_cls.method == names[-1]]
    merged = first[["cls_name", "acc"]].merge(
        last[["cls_name", "acc"]], on="cls_name", how="outer",
        suffixes=["_first", "_last"],
    )
    # classes measured under only one method have no defined gain; ranking
    # them (the reference notebook's outer merge sorts their NaNs last,
    # exactly where [-show_topn:] looks) would chart unmeasured classes
    merged = merged.dropna(subset=["acc_first", "acc_last"])
    gains = (merged["acc_last"] - merged["acc_first"]).sort_values()
    gained = merged.loc[gains.index].cls_name.tolist()
    if show_subset is not None:
        gained = [el for el in gained if show_subset(el)]
    gained = gained[-show_topn:]

    fig, ax = plt.subplots(
        figsize=(max(2 * len(gained), 4), 4), dpi=150
    )
    width = 0.8 / max(len(names), 1)
    xs = np.arange(len(gained))
    for mi, name in enumerate(names):
        sub = df[df.method == name]
        means = [sub[sub.cls_name == c]["acc"].mean() for c in gained]
        stds = [sub[sub.cls_name == c]["acc"].std(ddof=0) for c in gained]
        ax.bar(
            xs + (mi - (len(names) - 1) / 2) * width, means, width,
            yerr=np.nan_to_num(stds), label=name, capsize=2,
        )
    ax.set_xticks(xs)
    ax.set_xticklabels(gained, rotation=xticks_rotation, ha="center")
    ax.set_xlabel("Classes")
    ax.set_ylabel(ylabel)
    ax.legend()
    fig.tight_layout()
    if outfpath:
        os.makedirs(osp.dirname(outfpath) or ".", exist_ok=True)
        fig.savefig(outfpath)
    return fig, gained
