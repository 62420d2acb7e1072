"""EpicKitchens annotation loading with synthetic EK100-style files."""
import numpy as np
import pandas as pd
import pytest

from avt_tpu.data import NpyFeatsReader, convert_to_anticipation
from avt_tpu.data.epic_kitchens import (
    EPIC100_VERSION,
    EpicKitchens,
    gen_all_actions,
    load_action_classes,
)


@pytest.fixture
def ek_files(tmp_path):
    """Minimal EK100-style annotation + feature tree."""
    annot = tmp_path / "annot"
    annot.mkdir()
    # verb/noun class lists (EK100 header uses 'key')
    (annot / "EPIC_100_verb_classes.csv").write_text(
        "id,key,instances\n0,take,x\n1,put,x\n2,wash,x\n"
    )
    (annot / "EPIC_100_noun_classes.csv").write_text(
        "id,key,instances\n0,plate,x\n1,knife,x\n"
    )
    # RULSTM actions.csv: id,verb,noun,action
    (annot / "actions.csv").write_text(
        "id,verb,noun,action\n0,0,0,take_plate\n1,0,1,take_knife\n"
        "2,1,0,put_plate\n3,2,1,wash_knife\n"
    )
    # RULSTM-style training csv: uid,video_id,start_f,end_f,verb,noun,action
    rows = []
    for i in range(8):
        start_f = 400 + i * 300
        rows.append(f"{100+i},P01_01,{start_f},{start_f+90},{i%3},{i%2},{i%4}")
    (annot / "training.csv").write_text("\n".join(rows) + "\n")
    # feature store
    feats = tmp_path / "feats"
    feats.mkdir()
    arr = np.tile(
        np.arange(1, 4001, dtype=np.float32)[:, None], (1, 4)
    )
    np.save(feats / "P01_01.npy", arr)
    return annot, feats


def test_epic_kitchens_rulstm_csv(ek_files):
    annot, feats = ek_files
    ds = EpicKitchens(
        annotation_path=[str(annot / "training.csv")],
        action_labels_fpath=str(annot / "actions.csv"),
        annotation_dir=str(annot),
        version=EPIC100_VERSION,
        root=str(feats),
        frames_per_clip=10,
        frame_rate=1.0,
        subclips_options={"num_frames": 1, "stride": 1},
        reader=NpyFeatsReader(str(feats), read_type="normal"),
        label_type=["verb", "noun", "action"],
        sample_strategy="last_clip",
        conv_to_anticipate_fn=lambda d: convert_to_anticipation(d, 1.0, 10.0),
    )
    # frame 400/30 = 13.33s start; all 8 actions anticipatable
    assert len(ds) == 8
    assert ds.primary_metric == "final_acc/action/AR5"
    assert list(ds.classes.keys()) == ["verb", "noun", "action"]
    assert len(ds.verb_classes) == 3 and len(ds.noun_classes) == 2
    assert len(ds.action_classes) == 4

    item = ds[0]
    assert item["video"].shape == (10, 4, 1, 1, 1)
    assert item["uid"] == "100"
    # seconds: start_f=400 -> start=13.333; window [2.333, 12.333]
    assert item["end"] == pytest.approx(400 / 30.0 - 1.0)

    cm = ds.class_mappings
    via = cm[("verb", "action")]
    assert via.shape == (4, 3)
    np.testing.assert_array_equal(
        via, [[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]
    )
    nia = cm[("noun", "action")]
    np.testing.assert_array_equal(
        nia, [[1, 0], [0, 1], [1, 0], [0, 1]]
    )


def test_gen_all_actions_cross_product():
    names, vn2a = gen_all_actions(["take", "put"], ["plate", "knife"])
    assert names == {
        "take:plate": 0, "take:knife": 1, "put:plate": 2, "put:knife": 3
    }
    assert vn2a[(1, 0)] == 2


def test_load_action_classes(ek_files):
    annot, _ = ek_files
    names, vn2a = load_action_classes(annot / "actions.csv")
    assert names["wash_knife"] == 3
    assert vn2a[(2, 1)] == 3


def test_person_subset(ek_files):
    annot, feats = ek_files
    ds = EpicKitchens(
        annotation_path=[str(annot / "training.csv")],
        action_labels_fpath=str(annot / "actions.csv"),
        annotation_dir=str(annot),
        version=EPIC100_VERSION,
        only_keep_persons="2-5",  # P01 excluded
        root=str(feats),
        frames_per_clip=10,
        reader=NpyFeatsReader(str(feats), read_type="normal"),
        label_type="action",
    )
    assert len(ds) == 0


def test_egtea_dataset_and_action_classes(tmp_path):
    """EGTEA (version=-1): RULSTM-style csv annotations + the EGTEA actions
    list ('id,<verb>_<noun>,name' rows), no EPIC verb/noun csvs
    (reference epic_kitchens.py:217-243; expt 11 topology)."""
    from avt_tpu.data.epic_kitchens import (
        EGTEA_VERSION,
        EpicKitchens,
        load_action_classes_egtea,
    )
    from avt_tpu.data.readers import NpyFeatsReader

    annot = tmp_path / "annot"
    annot.mkdir()
    # EGTEA actions.csv: id,<verb>_<noun>,action-name (no header)
    (annot / "actions.csv").write_text(
        "0,0_0,take_bread\n1,0_1,take_knife\n2,1_0,cut_bread\n"
    )
    names, vn2a = load_action_classes_egtea(annot / "actions.csv")
    assert names == {"take_bread": 0, "take_knife": 1, "cut_bread": 2}
    assert vn2a[(1, 0)] == 2

    FPS, C = 30.0, 8
    rows = []
    for uid in range(6):
        start_f = 450 + uid * 300
        rows.append(
            f"{uid},OP01-R01-{uid:02d},{start_f},{start_f + 60},"
            f"{uid % 2},{uid % 2},{uid % 3}"
        )
        np.save(
            tmp_path / f"OP01-R01-{uid:02d}.npy",
            np.zeros((3000, C), np.float32),
        )
    (annot / "training1.csv").write_text("\n".join(rows))

    ds = EpicKitchens(
        version=EGTEA_VERSION,
        root=[str(tmp_path)],
        annotation_path=[str(annot / "training1.csv")],
        annotation_dir=str(annot),
        label_type="action",
        action_labels_fpath=str(annot / "actions.csv"),
        reader=NpyFeatsReader(str(tmp_path), read_type="normal"),
        frames_per_clip=4,
        frame_rate=1.0,
        sample_strategy="last_clip",
        conv_to_anticipate_fn=lambda d: convert_to_anticipation(
            d, tau_a=0.5, tau_o=2.5
        ),
    )
    # no verb/noun vocab for EGTEA; primary metric falls back to top-1
    assert ds.verb_classes == {} and ds.noun_classes == {}
    assert len(ds.classes["action"]) == 3
    assert ds.primary_metric == "final_acc/action/top1"
    item = ds[0]
    assert item["target"]["action"] == 0
    assert item["video"].shape[0] >= 1
    # verb/noun class mappings derive from the verb_noun ids in actions.csv
    maps = ds.class_mappings
    vmap = maps[("verb", "action")]  # (actions, verbs), reference key order
    assert vmap.shape == (3, 2)
    assert vmap[2, 1] == 1.0  # cut_bread -> verb 1


def test_breakfast_bundle_name_mapping(tmp_path):
    """Breakfast bundle entries map to person/camera paths, preferring the
    stereo channel whose .labels file exists (reference
    breakfast_50salads.py naming scheme)."""
    from avt_tpu.data.breakfast_50salads import (
        bundle_entry_to_video_fname_breakfast,
    )

    # plain camera
    (tmp_path / "P03" / "cam01").mkdir(parents=True)
    (tmp_path / "P03" / "cam01" / "P03_cereals.avi.labels").write_text("x")
    v, a = bundle_entry_to_video_fname_breakfast(
        "P03_cam01_P03_cereals.txt", str(tmp_path)
    )
    assert v == "P03/cam01/P03_cereals.avi"
    assert a == "P03/cam01/P03_cereals.avi.labels"
    # stereo: ch0 missing, ch1 present -> picks ch1
    (tmp_path / "P04" / "stereo").mkdir(parents=True)
    (tmp_path / "P04" / "stereo" / "P04_coffee_ch1.avi.labels").write_text("x")
    v, a = bundle_entry_to_video_fname_breakfast(
        "P04_stereo01_P04_coffee.txt", str(tmp_path)
    )
    assert v == "P04/stereo/P04_coffee_ch1.avi"


def test_ek55_pkl_annotations_and_person_subset(tmp_path):
    """EK55 (version=0.1) original pkl annotations: HH:MM:SS.f timestamps
    parse to seconds, noun/verb phrases normalize ('pan:frying' ->
    'frying pan', 'take-out' -> 'take out'), and the train-minus-val
    person-range subset keeps P01..P22 (reference epic_kitchens.py:340-391)."""
    import pickle

    from avt_tpu.data.epic_kitchens import EPIC55_VERSION, EpicKitchens
    from avt_tpu.data.readers import NpyFeatsReader

    annot = tmp_path / "annot"
    annot.mkdir()
    (annot / "EPIC_verb_classes.csv").write_text(
        "verb_id,class_key\n0,take\n1,put\n"
    )
    (annot / "EPIC_noun_classes.csv").write_text(
        "noun_id,class_key\n0,pan\n1,bread\n"
    )
    df = pd.DataFrame(
        {
            "uid": [1, 2, 3],
            "participant_id": ["P01", "P23", "P02"],
            "video_id": ["P01_01", "P23_02", "P02_05"],
            "start_timestamp": ["00:00:30.50", "00:01:00.00", "01:00:01.25"],
            "stop_timestamp": ["00:00:32.00", "00:01:02.00", "01:00:03.00"],
            "verb": ["take-out", "put", "take"],
            "noun": ["pan:frying", "bread", "pan"],
            "verb_class": [0, 1, 0],
            "noun_class": [0, 1, 0],
        }
    ).set_index("uid")
    with open(annot / "EPIC_train_action_labels.pkl", "wb") as f:
        pickle.dump(df, f)
    for vid in ("P01/P01_01.MP4", "P02/P02_05.MP4"):
        np.save(tmp_path / (vid.replace("/", "_") + ".npy"), np.zeros((1, 4)))

    ds = EpicKitchens(
        version=EPIC55_VERSION,
        root=[str(tmp_path)],
        annotation_path=[str(annot / "EPIC_train_action_labels.pkl")],
        annotation_dir=str(annot),
        label_type="verb",
        only_keep_persons="1-22",  # EK55 train-minus-val convention
        reader=NpyFeatsReader(str(tmp_path), read_type="normal"),
        frames_per_clip=4,
        frame_rate=1.0,
        sample_strategy="last_clip",
        conv_to_anticipate_fn=None,
    )
    d = ds.df
    assert len(d) == 2  # P23 dropped by the person subset
    assert d["start"].tolist() == pytest.approx([30.5, 3601.25])
    assert d["end"].tolist() == pytest.approx([32.0, 3603.0])
    assert d["noun"].tolist() == ["frying pan", "pan"]
    assert d["verb"].tolist() == ["take out", "take"]
    assert str(d["video_path"].iloc[0]) == "P01/P01_01.MP4"
    # verb x noun cross-product action vocab (no actions.csv given);
    # ds.classes itself is keyed by label_type ('verb' here)
    assert len(ds.action_classes) == 4
    assert list(ds.classes) == ["verb"]
