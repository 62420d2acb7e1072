"""Clip-sampler parity vs the reference common/sampler.py.

UniformClipSampler and the sampler-wrapping DistributedSampler are
deterministic -> exact index-sequence diffs against the reference classes
(VideoClips stubbed with a list-of-clip-counts fake, as the reference only
reads len(c) per video). RandomClipSampler draws from a different RNG
stream (torch vs numpy) -> structural parity: per-video pick counts,
range containment, and the global-shuffle multiset.
"""
import numpy as np
import pytest
import torch

import ref_harness

ref_harness.install_train_stubs()
ref_sampler = ref_harness.import_ref("common.sampler")

from avt_tpu.data.clip_samplers import (  # noqa: E402
    DistributedSamplerWrapper,
    RandomClipSampler,
    UniformClipSampler,
    build_clip_samplers,
)

CLIP_COUNTS = [7, 1, 10, 3, 0, 5, 16]


def _fake_video_clips(counts):
    """Instance of the stubbed torchvision VideoClips with .clips lists."""
    import torchvision.datasets.video_utils as vu

    vc = vu.VideoClips.__new__(vu.VideoClips)
    vc.clips = [list(range(c)) for c in counts]
    return vc


@pytest.mark.parametrize("max_clips", [1, 2, 4, 100])
def test_uniform_clip_sampler_exact(max_clips):
    vc = _fake_video_clips(CLIP_COUNTS)
    ref = ref_sampler.UniformClipSampler(vc, max_clips)
    got = UniformClipSampler(vc, max_clips)
    assert list(iter(got)) == list(iter(ref))
    # __len__ parity incl. the torchvision quirk where iteration can emit
    # MORE than max per video while __len__ reports min(len, max)
    assert len(got) == len(ref)


def test_random_clip_sampler_structure():
    vc = _fake_video_clips(CLIP_COUNTS)
    max_clips = 3
    torch.manual_seed(0)
    ref_idx = list(iter(ref_sampler.RandomClipSampler(vc, max_clips)))
    got = RandomClipSampler(vc, max_clips, seed=0)
    got_idx = list(iter(got))
    assert len(got_idx) == len(ref_idx) == len(got)
    # same per-video pick structure: min(len, max) picks, each within the
    # video's global index range, no duplicates within a video
    starts = np.cumsum([0] + CLIP_COUNTS)
    for i, c in enumerate(CLIP_COUNTS):
        for idx in (got_idx, ref_idx):
            mine = [j for j in idx if starts[i] <= j < starts[i + 1]]
            assert len(mine) == min(c, max_clips)
            assert len(set(mine)) == len(mine)
    # (seed, epoch)-deterministic AND idempotent: re-iterating emits the
    # same order (no hidden RNG mutation from len()/extra materializations)
    assert list(iter(got)) == got_idx
    len(got)
    assert list(iter(got)) == got_idx
    # per-epoch reshuffle via set_epoch
    got.set_epoch(1)
    epoch1 = list(iter(got))
    assert epoch1 != got_idx
    got.set_epoch(0)
    assert list(iter(got)) == got_idx


def test_distributed_random_sampler_partitions_one_permutation():
    """Cross-rank contract for the RANDOM sampler under the wrapper: every
    rank's wrapped sampler (same seed) emits the SAME global order, so the
    ranks' shards partition ONE permutation — no clip trained twice or
    skipped. The reference gets this from torch.manual_seed(cfg.seed) being
    identical on all ranks before its global-RNG draws; here it is the
    (seed, epoch) determinism of RandomClipSampler."""
    vc = _fake_video_clips(CLIP_COUNTS)
    world = 2
    for epoch in (0, 3):
        shards = []
        for rank in range(world):
            # separate instances per rank, same seed — as separate hosts
            w = DistributedSamplerWrapper(
                RandomClipSampler(vc, 3, seed=7), world, rank
            )
            w.set_epoch(epoch)
            shards.append(list(iter(w)))
        base = RandomClipSampler(vc, 3, seed=7)
        base.set_epoch(epoch)
        orig = list(iter(base))
        padded = orig + orig[: (-len(orig)) % world]
        assert sorted(shards[0] + shards[1]) == sorted(padded)
        assert shards[0] == padded[0::world] and shards[1] == padded[1::world]


@pytest.mark.parametrize("world", [1, 2, 3])
def test_distributed_wrapping_uniform_exact(world):
    """DistributedSampler wrapping ANOTHER sampler (common/sampler.py:48-52):
    positions [rank::world] of the padded list map through the wrapped
    sampler's emitted order — exact diff, the chain is deterministic."""
    vc = _fake_video_clips(CLIP_COUNTS)
    for rank in range(world):
        ref = ref_sampler.DistributedSampler(
            ref_sampler.UniformClipSampler(vc, 2),
            num_replicas=world, rank=rank, shuffle=False,
        )
        got = DistributedSamplerWrapper(
            UniformClipSampler(vc, 2), world, rank, shuffle=False
        )
        assert list(iter(got)) == list(iter(ref))
        assert len(got) == len(ref)


def test_distributed_plain_list_exact():
    """Non-sampler source: positional indices, padded to divisible."""
    data = list(range(11))
    for world, rank in [(2, 0), (2, 1), (4, 3)]:
        ref = ref_sampler.DistributedSampler(
            data, num_replicas=world, rank=rank, shuffle=False
        )
        got = DistributedSamplerWrapper(data, world, rank, shuffle=False)
        assert list(iter(got)) == list(iter(ref))


def test_distributed_shuffle_partition_contract():
    """shuffle=True RNG streams differ (torch vs numpy); the contract is:
    ranks partition a permutation of the padded index list, reshuffled by
    set_epoch."""
    data = list(range(10))
    world = 3
    samplers = [
        DistributedSamplerWrapper(data, world, r, shuffle=True)
        for r in range(world)
    ]
    for s in samplers:
        s.set_epoch(5)
    chunks = [list(iter(s)) for s in samplers]
    allidx = [i for c in chunks for i in c]
    assert len(allidx) == world * samplers[0].num_samples
    assert set(allidx) == set(range(10))  # padding repeats, union covers all
    for s in samplers:
        s.set_epoch(6)
    assert [list(iter(s)) for s in samplers] != chunks


def test_build_clip_samplers_selection():
    """Selection parity with func/train.py:606-634: video_clips present ->
    Random/Uniform (+ distributed wrap); absent -> (None, Nones)."""

    class DS:
        pass

    class VCDS:
        video_clips = _fake_video_clips(CLIP_COUNTS)

    tr, ev = build_clip_samplers(
        DS(), {"": DS()}, train_bs_multiplier=5, val_clips_per_video=1
    )
    assert tr is None and ev == {"": None}

    tr, ev = build_clip_samplers(
        VCDS(), {"": VCDS(), "_s2": VCDS()},
        train_bs_multiplier=5, val_clips_per_video=1,
    )
    assert isinstance(tr, RandomClipSampler)
    assert all(isinstance(s, UniformClipSampler) for s in ev.values())

    tr, ev = build_clip_samplers(
        VCDS(), {"": VCDS()},
        train_bs_multiplier=5, val_clips_per_video=1,
        rank=1, world_size=2,
    )
    assert isinstance(tr, DistributedSamplerWrapper)
    assert isinstance(ev[""], DistributedSamplerWrapper)
    with pytest.raises(AssertionError):
        build_clip_samplers(
            VCDS(), {}, train_bs_multiplier=5, val_clips_per_video=1,
            shuffle_data=False,
        )


def test_loader_accepts_sampler():
    """DataLoader(sampler=...) draws exactly the sampler's indices."""
    from avt_tpu.data.loader import DataLoader

    class TinyDS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {"idx": np.int64(i), "target": {"action": np.int64(i % 3)}}

    vc = _fake_video_clips([4, 4, 4, 4, 4])
    sampler = UniformClipSampler(vc, 2)
    loader = DataLoader(
        TinyDS(), 4, shuffle=True, drop_last=False, num_workers=2,
        sampler=sampler,
    )
    seen = []
    for batch in loader:
        seen.extend(batch["idx"].tolist())
    assert seen == list(iter(sampler))


def test_build_dataset_video_clips_and_precomputed_metadata(tmp_path):
    """The dataset factory's VideoClips branch (reference datasets/data.py:
    22-29,45-55): load _precomputed_metadata when the cache file exists,
    call video_clips.compute_clips(num_frames, 1, frame_rate) after
    construction, and save dataset.metadata when the cache is absent."""
    from avt_tpu.config.build import build_dataset
    from avt_tpu.config.registry import register_target

    calls = {}

    class FakeVC:
        def compute_clips(self, num_frames, step, frame_rate=None):
            calls["compute"] = (num_frames, step, frame_rate)

    class FakeVCDataset:
        def __init__(self, frames_per_clip=None, frame_rate=None,
                     subclips_options=None, load_seg_labels=None,
                     reader=None, transform=None, conv_to_anticipate_fn=None,
                     conv_to_anticipate_fn_runtime=None,
                     sample_clips_densely_fn=None,
                     _precomputed_metadata=None):
            calls["precomputed"] = _precomputed_metadata
            self.video_clips = FakeVC()
            self.metadata = {"video_paths": ["a.mp4"]}

        def __len__(self):
            return 1

    register_target("tests.FakeVCDataset", FakeVCDataset)
    cache = tmp_path / "meta.pkl"
    dcfg = {
        "_target_": "tests.FakeVCDataset",
        "_precomputed_metadata_file": str(cache),
    }
    data_cfg = {"num_frames": 7, "frame_rate": 15.0}

    ds = build_dataset(dict(dcfg), data_cfg)
    assert calls["precomputed"] is None       # no cache yet
    assert calls["compute"] == (7, 1, 15.0)   # compute_clips called
    assert cache.exists()                      # metadata saved

    build_dataset(dict(dcfg), data_cfg)
    assert calls["precomputed"] == {"video_paths": ["a.mp4"]}  # cache loaded
