"""EPIC-Kitchens-55 / EPIC-Kitchens-100 / EGTEA Gaze+ datasets.

Semantics-parity target: reference datasets/epic_kitchens.py:28-391
(EPICKitchens): original pkl annotations (HH:MM:SS.f timestamps) or RULSTM
csv annotations (30 fps frame numbers); verb/noun class csvs; action vocab
from the RULSTM actions.csv (or the full verb x noun cross-product);
(verb,noun)->action mapping applied to the df; person/video subset filters;
verb/noun-in-action 0/1 marginalization matrices; EK55 many-shot classes;
primary metric = class-mean recall@5 for EK100.
"""
from __future__ import annotations

import csv
import logging
import pickle as pkl
from collections import OrderedDict
from datetime import date, datetime
from pathlib import Path
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np
import pandas as pd

from avt_tpu.data.anticipation import RULSTM_TSN_FPS
from avt_tpu.data.dataset import VideoDataset

EGTEA_VERSION = -1
EPIC55_VERSION = 0.1
EPIC100_VERSION = 0.2

LOG = logging.getLogger(__name__)


def _timestr_to_sec(s: str, fmt: str = "%H:%M:%S.%f") -> float:
    timeobj = datetime.strptime(s, fmt).time()
    td = datetime.combine(date.min, timeobj) - datetime.min
    return td.total_seconds()


def load_action_classes(fpath) -> Tuple[Dict[str, int], Dict[Tuple[int, int], int]]:
    """RULSTM actions.csv: columns id,verb,noun,action."""
    class_names: Dict[str, int] = {}
    verb_noun_to_action: Dict[Tuple[int, int], int] = {}
    with open(fpath, "r") as fin:
        reader = csv.DictReader(fin, delimiter=",")
        for lno, line in enumerate(reader):
            class_names[line["action"]] = lno
            verb_noun_to_action[(int(line["verb"]), int(line["noun"]))] = int(
                line["id"]
            )
    return class_names, verb_noun_to_action


def load_action_classes_egtea(fpath) -> Tuple[Dict[str, int], Dict[Tuple[int, int], int]]:
    """EGTEA action list: 'id,<verb>_<noun>,action-name' rows, no header."""
    class_names: Dict[str, int] = {}
    verb_noun_to_action: Dict[Tuple[int, int], int] = {}
    with open(fpath, "r") as fin:
        reader = csv.DictReader(
            fin, delimiter=",", fieldnames=["id", "verb_noun", "action"]
        )
        for lno, line in enumerate(reader):
            class_names[line["action"]] = lno
            verb, noun = [int(el) for el in line["verb_noun"].split("_")]
            verb_noun_to_action[(verb, noun)] = int(line["id"])
    return class_names, verb_noun_to_action


def gen_all_actions(
    verb_classes: Sequence[str], noun_classes: Sequence[str]
) -> Tuple[Dict[str, int], Dict[Tuple[int, int], int]]:
    """Full verb x noun cross-product action vocabulary."""
    class_names: Dict[str, int] = {}
    verb_noun_to_action: Dict[Tuple[int, int], int] = {}
    action_id = 0
    for verb_id, verb_cls in enumerate(verb_classes):
        for noun_id, noun_cls in enumerate(noun_classes):
            class_names[f"{verb_cls}:{noun_cls}"] = action_id
            verb_noun_to_action[(verb_id, noun_id)] = action_id
            action_id += 1
    return class_names, verb_noun_to_action


class EpicKitchens(VideoDataset):
    """EK55 (version=0.1), EK100 (0.2) and EGTEA (-1) in one loader."""

    def __init__(
        self,
        annotation_path: Sequence[Union[str, Path]],
        only_keep_persons: str = None,
        only_keep_videos=None,
        action_labels_fpath=None,
        annotation_dir=None,
        rulstm_annotation_dir=None,
        version: float = EPIC55_VERSION,
        **other_kwargs,
    ):
        self.version = version
        if isinstance(annotation_path, (str, Path)):
            annotation_path = [annotation_path]
        df = pd.concat([self._load_df(str(el)) for el in annotation_path])
        df.reset_index(inplace=True, drop=True)
        df = self._subselect_df_by_videos(
            self._subselect_df_by_person(df, only_keep_persons), only_keep_videos
        )
        self.annotation_dir = (
            Path(annotation_dir)
            if annotation_dir is not None
            else Path(annotation_path[0]).parent
        )
        self.rulstm_annotation_dir = rulstm_annotation_dir
        epic_postfix = "_100" if self.version == EPIC100_VERSION else ""
        if self.version != EGTEA_VERSION:
            verb_classes = self._load_class_names(
                self.annotation_dir / f"EPIC{epic_postfix}_verb_classes.csv"
            )
            noun_classes = self._load_class_names(
                self.annotation_dir / f"EPIC{epic_postfix}_noun_classes.csv"
            )
        else:
            verb_classes, noun_classes = {}, {}
        if action_labels_fpath is not None:
            load_fn = (
                load_action_classes_egtea
                if self.version == EGTEA_VERSION
                else load_action_classes
            )
            action_classes, verb_noun_to_action = load_fn(action_labels_fpath)
        else:
            action_classes, verb_noun_to_action = gen_all_actions(
                list(verb_classes), list(noun_classes)
            )
        if "action_class" not in df.columns and {"noun_class", "verb_class"}.issubset(
            df.columns
        ):
            vn = list(zip(df["verb_class"], df["noun_class"]))
            df["action_class"] = [verb_noun_to_action.get(key, -1) for key in vn]
        elif "action_class" not in df.columns:
            df["action_class"] = -1
            df["verb_class"] = -1
            df["noun_class"] = -1
        num_undef = int((df["action_class"] == -1).sum())
        if num_undef > 0:
            LOG.error(
                "No valid action label for %d/%d samples", num_undef, len(df)
            )
        other_kwargs["verb_classes"] = verb_classes
        other_kwargs["noun_classes"] = noun_classes
        other_kwargs["action_classes"] = action_classes
        super().__init__(df, **other_kwargs)
        self.verb_noun_to_action = verb_noun_to_action

    # --------------------------------------------------------- properties
    @property
    def primary_metric(self) -> str:
        if self.version == EPIC100_VERSION:
            return "final_acc/action/AR5"
        return super().primary_metric

    @property
    def class_mappings(self) -> Dict[Tuple[str, str], np.ndarray]:
        """0/1 matrices mapping action logits to verb/noun scores.

        verb_in_action[a, v] = 1 iff action a's verb is v; used by the model
        to marginalize verb/noun predictions out of action logits.
        """
        num_verbs = len(self.verb_classes) or len(
            {v for (v, _) in self.verb_noun_to_action}
        )
        num_nouns = len(self.noun_classes) or len(
            {n for (_, n) in self.verb_noun_to_action}
        )
        num_actions = len(self.action_classes) or len(
            set(self.verb_noun_to_action.values())
        )
        verb_in_action = np.zeros((num_actions, num_verbs), dtype=np.float32)
        noun_in_action = np.zeros((num_actions, num_nouns), dtype=np.float32)
        for (verb, noun), action in self.verb_noun_to_action.items():
            verb_in_action[action, verb] = 1.0
            noun_in_action[action, noun] = 1.0
        return {
            ("verb", "action"): verb_in_action,
            ("noun", "action"): noun_in_action,
        }

    @property
    def classes_manyshot(self) -> OrderedDict:
        """EK55 many-shot classes (RULSTM recall convention); else all."""
        if self.version != EPIC55_VERSION:
            return super().classes_manyshot
        many_shot_verbs = {
            el["verb"]: el["verb_class"]
            for el in pd.read_csv(
                self.annotation_dir / "EPIC_many_shot_verbs.csv"
            ).to_dict("records")
        }
        many_shot_nouns = {
            el["noun"]: el["noun_class"]
            for el in pd.read_csv(
                self.annotation_dir / "EPIC_many_shot_nouns.csv"
            ).to_dict("records")
        }
        # An action is many-shot if its verb OR its noun is many-shot.
        many_shot_actions = {}
        action_names = {val: key for key, val in self.action_classes.items()}
        for (verb_id, noun_id), action_id in self.verb_noun_to_action.items():
            if verb_id in many_shot_verbs.values() or noun_id in many_shot_nouns.values():
                many_shot_actions[action_names[action_id]] = action_id
        return OrderedDict(
            verb=many_shot_verbs, noun=many_shot_nouns, action=many_shot_actions
        )

    # ------------------------------------------------------------ loading
    def _load_class_names(self, annot_path) -> Dict[str, int]:
        res = {}
        key_col = "class_key" if self.version == EPIC55_VERSION else "key"
        with open(annot_path, "r") as fin:
            for lno, line in enumerate(csv.DictReader(fin, delimiter=",")):
                res[line[key_col]] = lno
        return res

    def _load_df(self, annotation_path: str) -> pd.DataFrame:
        if annotation_path.endswith(".pkl"):
            return self._init_df_orig(annotation_path)
        if annotation_path.endswith(".csv"):
            return self._init_df_rulstm(annotation_path)
        raise NotImplementedError(annotation_path)

    def _init_df_gen_vidpath(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.version == EGTEA_VERSION:
            df["video_path"] = [Path(v + ".mp4") for v in df["video_id"]]
        else:
            df["video_path"] = [
                Path(p) / (v + ".MP4")
                for p, v in zip(df["participant_id"], df["video_id"])
            ]
        return df

    def _init_df_rulstm(self, annotation_path: str) -> pd.DataFrame:
        """RULSTM csv: uid,video_id,start_frame,end_frame,verb,noun,action
        with frame numbers at the fixed 30 fps feature rate."""
        df = pd.read_csv(
            annotation_path,
            names=[
                "uid",
                "video_id",
                "start_frame_30fps",
                "end_frame_30fps",
                "verb_class",
                "noun_class",
                "action_class",
            ],
            index_col=0,
            skipinitialspace=True,
            dtype={
                "uid": str,
                "video_id": str,
                "start_frame_30fps": int,
                "end_frame_30fps": int,
                "verb_class": int,
                "noun_class": int,
                "action_class": int,
            },
        )
        df.reset_index(drop=False, inplace=True)
        df["start"] = df["start_frame_30fps"] / RULSTM_TSN_FPS
        df["end"] = df["end_frame_30fps"] / RULSTM_TSN_FPS
        df["participant_id"] = [v.split("_")[0] for v in df["video_id"]]
        df = self._init_df_gen_vidpath(df)
        df.reset_index(inplace=True, drop=True)
        return df

    def _init_df_orig(self, annotation_path: str) -> pd.DataFrame:
        """Original EPIC pkl annotations with HH:MM:SS.f timestamps."""
        with open(annotation_path, "rb") as fin:
            df = pkl.load(fin)
        df.reset_index(drop=False, inplace=True)
        df["start"] = df["start_timestamp"].apply(_timestr_to_sec)
        df["end"] = df["stop_timestamp"].apply(_timestr_to_sec)
        # normalize the reversed "noun:of phrase" and dashed-verb formats.
        # NOTE the token reversal is the reference's verbatim idiom
        # (epic_kitchens.py:363-365): "liquid:washing up" -> "up washing
        # liquid", NOT "washing up liquid" — kept for bit-parity of any
        # name-keyed artifact
        if "noun" in df.columns:
            df["noun"] = df["noun"].apply(
                lambda s: " ".join(s.replace(":", " ").split(" ")[::-1])
            )
        if "verb" in df.columns:
            df["verb"] = df["verb"].apply(
                lambda s: " ".join(s.replace("-", " ").split(" "))
            )
        df = self._init_df_gen_vidpath(df)
        df.reset_index(inplace=True, drop=True)
        return df

    @staticmethod
    def _subselect_df_by_person(df, only_keep_persons):
        """Keep P<start>..P<end> (EK55 train-minus-val convention)."""
        if only_keep_persons is None:
            return df
        start, end = [int(el) for el in only_keep_persons.split("-")]
        keep = ["P{:02d}".format(el) for el in range(start, end + 1)]
        return df.loc[df["participant_id"].isin(keep), :].reset_index(drop=True)

    @staticmethod
    def _subselect_df_by_videos(df, videos_fpath):
        if videos_fpath is None:
            return df
        with open(videos_fpath, "r") as fin:
            keep = [el.strip() for el in fin.read().splitlines()]
        return df.loc[df["video_id"].isin(keep), :].reset_index(drop=True)
