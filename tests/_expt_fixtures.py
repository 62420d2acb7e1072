"""Synthetic DATA/ tree covering every path the 27 expt files compose to.

All shipped configs anchor their data under /root/repo/DATA/...; the
build-and-step matrix rewrites that prefix to a tmp tree built here:

  annotations/epic-kitchens-100/  EPIC_100_{train,validation}.pkl (labeled),
                                  EPIC_100_test_timestamps.pkl (label-less),
                                  EPIC_100_{verb,noun}_classes.csv
  annotations/epic-kitchens-55/   EPIC_train_action_labels.pkl + class csvs
  annotations/rulstm/{ek100,ek55}/ actions.csv (+ek55 video-split csvs)
  annotations/rulstm/egtea/       training1/validation1.csv + actions.csv
  annotations/50salads/           mapping.txt + 50s_splits bundles
  external/... + extracted_features/...  fake-lmdb feature stores with the
                                  channel counts the expts configure
  videos/...                      cv2-written decodable clips for the
                                  raw-video expts (EK100/EK55/EGTEA/50Salads)

Class spaces are tiny (3 verbs x 2 nouns, 4 RULSTM actions) but the
structure (non-cross-product action vocab, label-less test split, EK55
video-split files) matches the real datasets.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np
import pandas as pd

import ref_harness

RAW_FPS = 10.0        # synthetic raw videos
STORE_FPS = 30        # RULSTM feature stores key frames at 30 fps
VIDEO_SECONDS = 45.0
STORE_SECONDS = 27.0  # windows end <= ~24 s; stores cover a margin past it

# action instants (seconds): leaves room for tau_o up to 20 (expts/09)
ACTION_STARTS = [25.0, 31.0, 37.0]

EK100_VIDEOS = ["P01/P01_01", "P02/P02_03"]
EK55_VIDEOS = ["P01/P01_01", "P02/P02_05"]
EGTEA_VIDEOS = ["OP01-R01-00", "OP01-R02-01"]


def _sec_to_timestr(sec: float) -> str:
    h = int(sec // 3600)
    m = int((sec % 3600) // 60)
    return f"{h:02d}:{m:02d}:{sec % 60:06.3f}"


def _write_video(path: Path, seconds: float = VIDEO_SECONDS) -> None:
    import cv2

    path.parent.mkdir(parents=True, exist_ok=True)
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), RAW_FPS, (128, 96)
    )
    rng = np.random.default_rng(hash(path.name) % (2**31))
    base = rng.integers(60, 180, size=(96, 128, 3)).astype(np.uint8)
    for i in range(int(seconds * RAW_FPS)):
        frame = base.copy()
        frame[:16, :16] = (i * 7) % 255
        w.write(frame)
    w.release()


def _lmdb_store(path: Path, video_ids, channels: int, seed: int) -> None:
    """Fake-lmdb store keyed <video>_frame_%010d.jpg, f32 rows."""
    lmdb = ref_harness._load_fake_lmdb()
    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    env = lmdb.open(str(path), readonly=False)
    n = int(STORE_SECONDS * STORE_FPS)
    with env.begin(write=True) as txn:
        for vid in video_ids:
            feats = rng.normal(size=(n + 1, channels)).astype(np.float32)
            for i in range(1, n + 1):
                txn.put(f"{vid}_frame_{i:010d}.jpg".encode(), feats[i].tobytes())


def _annotation_rows(video_ids, n_verb=3, n_noun=2):
    rows = []
    uid = 100
    for v, vid in enumerate(video_ids):
        part, _, stem = vid.partition("/")
        for i, at in enumerate(ACTION_STARTS):
            rows.append(
                dict(
                    uid=uid,
                    participant_id=part if stem else vid.split("-")[0],
                    video_id=stem or vid,
                    start=at,
                    end=at + 2.0,
                    verb_class=(v + i) % n_verb,
                    noun_class=i % n_noun,
                )
            )
            uid += 1
    return rows


def _ek_pkl(path: Path, rows, labeled: bool = True) -> None:
    verbs = {0: "take", 1: "put-down", 2: "wash-up"}
    nouns = {0: "plate", 1: "knife:small"}
    data = {
        "uid": [r["uid"] for r in rows],
        "participant_id": [r["participant_id"] for r in rows],
        "video_id": [r["video_id"] for r in rows],
        "start_timestamp": [_sec_to_timestr(r["start"]) for r in rows],
        "stop_timestamp": [_sec_to_timestr(r["end"]) for r in rows],
    }
    if labeled:
        data.update(
            verb=[verbs[r["verb_class"]] for r in rows],
            noun=[nouns[r["noun_class"]] for r in rows],
            verb_class=[r["verb_class"] for r in rows],
            noun_class=[r["noun_class"] for r in rows],
        )
    df = pd.DataFrame(data).set_index("uid")
    with open(path, "wb") as f:
        pickle.dump(df, f)


def _rulstm_csv(path: Path, rows) -> None:
    """uid,video,start_frame,stop_frame,verb,noun,action at 30 fps."""
    acts = _ACTION_MAP
    lines = []
    for r in rows:
        a = acts.get((r["verb_class"], r["noun_class"]), -1)
        if a < 0:
            a = 0  # RULSTM csvs always carry an action id
        lines.append(
            f"{r['uid']},{r['video_id']},{int(r['start'] * 30)},"
            f"{int(r['end'] * 30)},{r['verb_class']},{r['noun_class']},{a}"
        )
    path.write_text("\n".join(lines))


# RULSTM action vocab: NOT the full cross product (3 verbs x 2 nouns -> 4)
_ACTION_MAP = {(0, 0): 0, (0, 1): 1, (1, 0): 2, (2, 1): 3}


def _actions_csv(path: Path) -> None:
    lines = ["id,verb,noun,action"]
    names = {0: "take_plate", 1: "take_knife", 2: "put_plate", 3: "wash_knife"}
    for (v, n), a in sorted(_ACTION_MAP.items(), key=lambda kv: kv[1]):
        lines.append(f"{a},{v},{n},{names[a]}")
    path.write_text("\n".join(lines))


def _class_csvs(annot: Path, prefix: str) -> None:
    (annot / f"{prefix}_verb_classes.csv").write_text(
        "id,key\n0,take\n1,put\n2,wash"
    )
    (annot / f"{prefix}_noun_classes.csv").write_text(
        "id,key\n0,plate\n1,knife"
    )


def build_data_tree(root: Path) -> Path:
    """Create the full synthetic DATA/ tree; returns the DATA dir."""
    data = root / "DATA"

    # ---------------------------------------------------------- EK100
    annot = data / "annotations" / "epic-kitchens-100"
    annot.mkdir(parents=True)
    rows = _annotation_rows(EK100_VIDEOS)
    _ek_pkl(annot / "EPIC_100_train.pkl", rows)
    _ek_pkl(annot / "EPIC_100_validation.pkl", rows)
    _ek_pkl(annot / "EPIC_100_test_timestamps.pkl", rows, labeled=False)
    _class_csvs(annot, "EPIC_100")
    rul = data / "annotations" / "rulstm" / "ek100"
    rul.mkdir(parents=True)
    _actions_csv(rul / "actions.csv")
    stems = [v.split("/")[1] for v in EK100_VIDEOS]
    ekfull = data / "external" / "rulstm" / "RULSTM" / "ek100_data_full"
    _lmdb_store(ekfull / "rgb", stems, 1024, seed=1)
    _lmdb_store(ekfull / "obj", stems, 352, seed=2)
    _lmdb_store(ekfull / "flow", stems, 1024, seed=3)
    _lmdb_store(
        data / "extracted_features" / "ek100"
        / "ig65m_ftEk100_logits_10fps1s" / "rgb",
        stems, 2048, seed=4,
    )
    for vid in EK100_VIDEOS:
        _write_video(
            data / "videos" / "EpicKitchens100" / "videos_extension_ht256px"
            / f"{vid}.MP4"
        )

    # ----------------------------------------------------------- EK55
    annot = data / "annotations" / "epic-kitchens-55"
    annot.mkdir(parents=True)
    rows = _annotation_rows(EK55_VIDEOS)
    _ek_pkl(annot / "EPIC_train_action_labels.pkl", rows)
    (annot / "EPIC_verb_classes.csv").write_text(
        "verb_id,class_key\n0,take\n1,put\n2,wash"
    )
    (annot / "EPIC_noun_classes.csv").write_text(
        "noun_id,class_key\n0,plate\n1,knife"
    )
    rul = data / "annotations" / "rulstm" / "ek55"
    rul.mkdir(parents=True)
    _actions_csv(rul / "actions.csv")
    stems55 = [v.split("/")[1] for v in EK55_VIDEOS]
    # EK55 train/val split by video id (expts 08-10 only_keep_videos)
    (rul / "training_videos.csv").write_text(stems55[0] + "\n")
    (rul / "validation_videos.csv").write_text(stems55[1] + "\n")
    # EK55 many-shot classes (reference epic_kitchens.py:154-192)
    (annot / "EPIC_many_shot_verbs.csv").write_text("verb_class\n0\n1")
    (annot / "EPIC_many_shot_nouns.csv").write_text("noun_class\n0")
    _lmdb_store(
        data / "external" / "rulstm" / "RULSTM" / "ek55_data_full" / "rgb",
        stems55, 1024, seed=5,
    )
    _lmdb_store(
        data / "extracted_features" / "ek55"
        / "ig65m_ftEk55train_logits_25fps" / "rgb",
        stems55, 2048, seed=6,
    )
    for vid in EK55_VIDEOS:
        _write_video(data / "videos" / "EpicKitchens" / "train" / f"{vid}.MP4")

    # ---------------------------------------------------------- EGTEA
    rul = data / "annotations" / "rulstm" / "egtea"
    rul.mkdir(parents=True)
    # EGTEA actions.csv: id,<verb>_<noun>,name (no header)
    (rul / "actions.csv").write_text(
        "0,0_0,take_plate\n1,0_1,take_knife\n2,1_0,put_plate\n3,2_1,wash_knife"
    )
    rows = _annotation_rows(EGTEA_VIDEOS)
    _rulstm_csv(rul / "training1.csv", rows[:3])
    _rulstm_csv(rul / "validation1.csv", rows[3:])
    _lmdb_store(
        data / "external" / "rulstm" / "RULSTM" / "egtea_data"
        / "TSN-C_3_egtea_action_CE_s1_rgb_model_best_fcfull_hd",
        EGTEA_VIDEOS, 1024, seed=7,
    )
    for vid in EGTEA_VIDEOS:
        _write_video(data / "videos" / "EGTEA" / "101020" / "videos" / f"{vid}.mp4")

    # -------------------------------------------------------- 50Salads
    sal_annot = data / "annotations" / "50salads"
    (sal_annot / "50s_splits").mkdir(parents=True)
    (sal_annot / "groundTruth").mkdir()
    (sal_annot / "mapping.txt").write_text(
        "0 cut_tomato\n1 peel_cucumber\n2 mix_ingredients\n"
    )
    vids = data / "videos" / "50Salads"
    (vids / "rgb").mkdir(parents=True)
    (vids / "activityAnnotations").mkdir()
    (vids / "timestamps").mkdir()
    names = ["01-1", "02-1", "03-1"]
    classes = ["cut_tomato", "peel_cucumber", "mix_ingredients"]
    n_frames = int(VIDEO_SECONDS * RAW_FPS)
    for v, vid_id in enumerate(names):
        _write_video(vids / "rgb" / f"rgb-{vid_id}.avi")
        # hardware timestamps: offset ints, one per frame
        (vids / "timestamps" / f"timestamps-{vid_id}.txt").write_text(
            "\n".join(f"{10000 + i} 0 0" for i in range(n_frames)) + "\n"
        )
        lines = []
        for i, at in enumerate(ACTION_STARTS):
            name = classes[(v + i) % len(classes)]
            s = 10000 + int(at * RAW_FPS)
            e = 10000 + int((at + 2.0) * RAW_FPS) - 1
            lines.append(f"{s} {e} {name}_core")
        (vids / "activityAnnotations" / f"{vid_id}-activityAnnotation.txt"
         ).write_text("\n".join(lines) + "\n")
    for fold in range(1, 6):
        (sal_annot / "50s_splits" / f"train.split{fold}.bundle").write_text(
            "#bundle\nrgb-01-1.txt\nrgb-02-1.txt\n"
        )
        (sal_annot / "50s_splits" / f"test.split{fold}.bundle").write_text(
            "#bundle\nrgb-03-1.txt\n"
        )

    return data
