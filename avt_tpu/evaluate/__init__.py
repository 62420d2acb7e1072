"""Evaluation: result sinks, offline metrics, marginalization/fusion.

Mirrors the reference's evaluate path (func/train.py:319-429) and the
offline analysis layer (notebooks/utils.py): per-process H5 result files
holding logits/targets/uids/unreduced-losses are THE interface between
training and all offline metric computation, late fusion and challenge
submission packaging.
"""
from avt_tpu.evaluate.metrics import (
    compute_topk,
    topk_recall,
    compute_conf_mat,
    mean_class_accuracy,
    compute_accuracy,
    combine_verb_noun_preds,
    final_accuracies_from_results,
)
from avt_tpu.evaluate.results import (
    STR_UID_MAXLEN,
    store_append_h5,
    read_results,
    read_all_results,
)
from avt_tpu.evaluate.evaluator import evaluate

__all__ = [
    "compute_topk",
    "topk_recall",
    "compute_conf_mat",
    "mean_class_accuracy",
    "compute_accuracy",
    "combine_verb_noun_preds",
    "final_accuracies_from_results",
    "STR_UID_MAXLEN",
    "store_append_h5",
    "read_results",
    "read_all_results",
    "evaluate",
]
