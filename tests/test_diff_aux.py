"""Differentials vs reference common/cluster.py, common/sampler.py and
datasets/reader_fns.py — the last aux modules not yet pinned against the
upstream source itself (the rest are covered in test_diff_reference /
test_diff_metrics / test_diff_dataset_e2e).
"""
import sys
import types

import numpy as np
import pytest
import torch

import ref_harness

# common/sampler.py does `import torchvision.datasets.video_utils` for an
# isinstance check we never hit; the train-stub set carries that surface.
ref_harness.install_train_stubs()

ref_cluster = ref_harness.import_ref("common.cluster")
ref_sampler = ref_harness.import_ref("common.sampler")
ref_readers = ref_harness.import_ref("datasets.reader_fns")


# ------------------------------------------------------------- cluster.py
@pytest.mark.parametrize("norm", [False, True])
def test_kmeans_assigner_vs_reference(tmp_path, norm):
    """Same centroid checkpoint -> identical assignments and features.

    Reference common/cluster.py:KmeansAssigner (torch.cdist + argmin);
    ours uses the argmin-by-dot trick — ids must agree exactly on
    well-separated data, cluster2feat bit-exactly always.
    """
    from avt_tpu.models.cluster import KmeansAssigner

    rng = np.random.default_rng(0)
    K, C = 32, 16
    cents = rng.normal(size=(K, C)).astype(np.float32)
    fpath = tmp_path / "centroids.pth"
    torch.save({"weight": torch.from_numpy(cents)}, fpath)

    theirs = ref_cluster.KmeansAssigner(str(fpath), norm=norm)
    ours = KmeansAssigner(str(fpath), norm=norm)
    assert ours.num_clusters == theirs.num_clusters == K

    # float input -> nearest-centroid ids (B, T, C) -> (B, T)
    feats = rng.normal(size=(4, 7, C)).astype(np.float32)
    ref_ids = theirs(torch.from_numpy(feats)).numpy()
    our_ids = np.asarray(ours(feats))
    np.testing.assert_array_equal(our_ids, ref_ids)

    # integer input -> centroid features (B, T) -> (B, T, C)
    ids = rng.integers(0, K, size=(4, 7))
    ref_feats = theirs(torch.from_numpy(ids)).numpy()
    our_feats = np.asarray(ours(np.asarray(ids)))
    np.testing.assert_allclose(our_feats, ref_feats, rtol=0, atol=0)


def test_kmeans_fit_output_loads_in_reference(tmp_path):
    """Centroids produced by our TPU-native kmeans_fit round-trip through
    the reference's loader convention (torch ckpt with a 'weight' key)."""
    from avt_tpu.models.cluster import kmeans_fit

    rng = np.random.default_rng(1)
    feats = np.concatenate([
        c + 0.05 * rng.normal(size=(50, 8)) for c in (np.zeros(8), np.ones(8) * 3)
    ]).astype(np.float32)
    cents = kmeans_fit(feats, k=2, iters=10, seed=0, chunk=32)
    fpath = tmp_path / "cent.pth"
    torch.save({"weight": torch.from_numpy(np.asarray(cents))}, fpath)
    theirs = ref_cluster.KmeansAssigner(str(fpath))
    labels = theirs(torch.from_numpy(feats)).numpy()
    assert (labels[:50] == labels[0]).all()
    assert (labels[50:] == labels[50]).all()
    assert labels[0] != labels[50]


# ------------------------------------------------------------- sampler.py
class _LenOnly:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


@pytest.mark.parametrize("n,world", [(10, 1), (13, 2), (13, 4), (16, 4)])
def test_distributed_shard_noshuffle_vs_reference(n, world):
    """shuffle=False: our loader's shard indices == the reference
    DistributedSampler's exactly (pad-by-repeat-from-front + stride)."""
    from avt_tpu.data.loader import DataLoader

    for rank in range(world):
        ref = list(iter(ref_sampler.DistributedSampler(
            _LenOnly(n), num_replicas=world, rank=rank, shuffle=False)))
        dl = DataLoader(_LenOnly(n), batch_size=1, shuffle=False,
                        rank=rank, world_size=world)
        ours = dl._epoch_indices().tolist()
        assert ours == ref, (rank, ours, ref)


@pytest.mark.parametrize("n,world", [(13, 4), (10, 2)])
def test_distributed_shard_shuffle_properties_vs_reference(n, world):
    """shuffle=True: bit-identical permutations are not required (torch
    randperm vs np shuffle) but the *partition contract* must match the
    reference: equal ceil(n/world) shard sizes, shards disjoint except the
    pad, every index covered, pad indices duplicated exactly once, and
    set_epoch reshuffles deterministically."""
    from avt_tpu.data.loader import DataLoader

    def shards(make_iter, set_epoch, epoch):
        out = []
        for rank in range(world):
            it, setter = make_iter(rank)
            setter(epoch)
            out.append(list(it()))
        return out

    def ref_make(rank):
        s = ref_sampler.DistributedSampler(
            _LenOnly(n), num_replicas=world, rank=rank, shuffle=True)
        return (lambda: iter(s)), s.set_epoch

    def our_make(rank):
        dl = DataLoader(_LenOnly(n), batch_size=1, shuffle=True,
                        rank=rank, world_size=world)
        return (lambda: dl._epoch_indices().tolist()), dl.set_epoch

    per = -(-n // world)
    pad = per * world - n
    for make in (ref_make, our_make):
        a = shards(make, None, epoch=3)
        assert all(len(s) == per for s in a)
        flat = np.concatenate(a)
        counts = np.bincount(flat, minlength=n)
        assert counts.min() >= 1 and counts.sum() == per * world
        assert (counts == 2).sum() == pad and (counts > 2).sum() == 0
        # deterministic per epoch; different across epochs (n! >> 1)
        assert shards(make, None, epoch=3) == a
        assert shards(make, None, epoch=4) != a


# ------------------------------------------------------ datasets/data.py
class Recorder:
    """Stub dataset target: records the kwargs the factory wires in."""

    last = None

    def __init__(self, **kwargs):
        Recorder.last = kwargs

    def __len__(self):
        return 1


def test_dataset_factory_kwarg_wiring_vs_reference():
    """get_dataset (datasets/data.py:18-55) vs our build_dataset: both
    must inject the same data-cfg-derived kwargs (num_frames ->
    frames_per_clip, frame_rate, subclips dict, load_seg_labels,
    transform) into the dataset target."""
    import logging

    ref_data = ref_harness.import_ref("datasets.data")
    from avt_tpu.config.build import build_dataset
    from avt_tpu.config.registry import register_target

    register_target("test_diff_aux.Recorder", Recorder)

    data_cfg = {
        "num_frames": 10,
        "frame_rate": 1.0,
        "subclips": {"num_frames": 1, "stride": 1},
        "load_seg_labels": True,
    }
    ref_data.get_dataset(
        {"_target_": "test_diff_aux.Recorder"},
        types.SimpleNamespace(**data_cfg),
        transform="SENTINEL-TRANSFORM",
        logger=logging.getLogger("x"),
    )
    ref_kwargs = dict(Recorder.last)
    Recorder.last = None

    build_dataset(
        {"_target_": "test_diff_aux.Recorder"}, data_cfg,
        transform="SENTINEL-TRANSFORM",
    )
    our_kwargs = dict(Recorder.last)

    for key in ("frames_per_clip", "frame_rate", "subclips_options",
                "load_seg_labels", "transform"):
        assert our_kwargs.get(key) == ref_kwargs.get(key), (
            key, our_kwargs.get(key), ref_kwargs.get(key))
    # ours additionally resolves reader_fn itself (the reference defers
    # to hydra inside BaseVideoDataset); the default maps the reference's
    # DefaultReader target onto our native libav reader
    assert type(our_kwargs["reader"]).__name__ == "LibavVideoReader"


# ---------------------------------------------------------- reader_fns.py
def test_onehot_reader_vs_reference():
    """VideoAsLabelOnehotReader: same df row -> identical (T,1,1,C) one-hot
    'video' (reference datasets/reader_fns.py:34-67)."""
    from avt_tpu.data.readers import VideoAsLabelOnehotReader

    rng = np.random.default_rng(0)
    T, C = 6, 20
    labels = rng.integers(0, C, size=(T,))
    row = {
        "end": 12.5,
        "obs_action_class": np.stack([np.arange(T), labels], axis=1),
    }
    ref_out, ref_a, ref_b = ref_readers.VideoAsLabelOnehotReader()(
        "unused.mp4", 0.0, 12.5, fps=None, df_row=row, num_classes=C)
    ours = VideoAsLabelOnehotReader(num_classes=C)
    our_out, _ = ours("unused.mp4", 0.0, 12.5, fps=None, row=row)
    assert ref_a == {} and ref_b == {}
    np.testing.assert_array_equal(np.asarray(our_out), ref_out.numpy())

    # both sides reject non-last-clip windows the same way
    with pytest.raises(AssertionError):
        ref_readers.VideoAsLabelOnehotReader()(
            "unused.mp4", 0.0, 11.0, fps=None, df_row=row, num_classes=C)
    with pytest.raises(AssertionError):
        ours("unused.mp4", 0.0, 11.0, fps=None, row=row)
