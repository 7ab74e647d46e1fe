"""Randomized parity fuzz: window/chunk index builders vs the reference's
own `_img_utils` (ref: lib/data_utils/_img_utils.py:332-455).

These host-side index computations define every training/eval item; an
off-by-one silently corrupts supervision for whole datasets, and the fixed
cases in test_data.py can't cover the combinatorial edge space (clip ==
seqlen, clip == vidlen budget, truncation at item boundaries, match_vibe
tail trims). So: many random video-length layouts, every function compared
element-for-element against the reference's own implementation.

Documented divergences (each asserted explicitly below):
  * combine_into_chunks drops clips shorter than seqlen — packing them
    would move the channel offset backward and overwrite the previous
    clip's frames (see chunking.py:120-126); the reference packs them.
  * split_into_chunks(match_vibe=True) on a <16-frame video: the
    reference CRASHES (view_as_windows window > array); ours skips the
    trim for that video.
"""

import numpy as np
import pytest

import reference_shims as shims
from tepose_tpu.data import chunking as C


@pytest.fixture(scope="module")
def ref_img():
    shims.install_reference()
    from lib.data_utils import _img_utils as ref

    return ref


def _layout(rng, n_videos, min_len, max_len):
    """Random per-video lengths with names whose SORTED order differs from
    appearance order (the reference re-permutes np.unique output — the
    quirk most worth fuzzing)."""
    lens = rng.randint(min_len, max_len + 1, size=n_videos)
    labels = [f"v{i:03d}" for i in rng.permutation(n_videos * 2)[:n_videos]]
    return np.repeat(np.array(labels), lens), lens


def _as_int(x):
    """Normalise nested lists of np ints to plain ints for comparison."""
    if isinstance(x, (list, tuple)):
        return [_as_int(v) for v in x]
    return int(x)


def test_split_into_videos_fuzz(ref_img, rng):
    for trial in range(60):
        names, _ = _layout(rng, rng.randint(1, 9), 1, 30)
        seqlen = rng.randint(2, 9)
        vidlen = rng.randint(seqlen, 41)
        ours = C.split_into_videos(names, seqlen, 1, vidlen)
        ref = ref_img.split_into_videos(names, seqlen, 1, vidlen)
        assert _as_int(list(ours[0])) == _as_int(list(ref[0])), trial
        assert _as_int(list(ours[1])) == _as_int(list(ref[1])), trial


def test_split_into_videos_val_fuzz(ref_img, rng):
    for trial in range(60):
        names, _ = _layout(rng, rng.randint(1, 9), 1, 30)
        seqlen = rng.randint(2, 9)
        ours = C.split_into_videos_val(names, seqlen, 1)
        ref = ref_img.split_into_videos_val(names, seqlen, 1)
        assert _as_int(list(ours[0])) == _as_int(list(ref[0])), trial
        assert _as_int(list(ours[1])) == _as_int(list(ref[1])), trial


def test_split_into_chunks_fuzz(ref_img, rng):
    for trial in range(120):
        names, _ = _layout(rng, rng.randint(1, 7), 1, 40)
        seqlen = rng.randint(2, 9)
        stride = rng.choice([1, 2, 3, seqlen])
        is_train = bool(rng.randint(2))
        ours = C.split_into_chunks(names, seqlen, int(stride),
                                   is_train=is_train)
        ref = ref_img.split_into_chunks(names, seqlen, int(stride),
                                        is_train=is_train)
        assert _as_int(list(ours)) == _as_int(list(ref)), (
            trial, seqlen, int(stride), is_train)


def test_split_into_chunks_match_vibe_fuzz(ref_img, rng):
    # every video >= 16 frames: shorter ones crash the REFERENCE
    # (view_as_windows window larger than array)
    for trial in range(60):
        names, _ = _layout(rng, rng.randint(1, 6), 16, 64)
        seqlen = rng.randint(2, 9)
        stride = rng.randint(1, seqlen)  # match_vibe only acts off-seqlen
        is_train = bool(rng.randint(2))
        ours = C.split_into_chunks(names, seqlen, int(stride),
                                   is_train=is_train, match_vibe=True)
        ref = ref_img.split_into_chunks(names, seqlen, int(stride),
                                        is_train=is_train, match_vibe=True)
        assert _as_int(list(ours)) == _as_int(list(ref)), (
            trial, seqlen, int(stride), is_train)

    # divergence pin: a <16-frame video under match_vibe crashes the
    # reference; ours returns its untrimmed windows
    short, _ = _layout(rng, 1, 8, 12)
    with pytest.raises(ValueError):
        ref_img.split_into_chunks(short, 4, 1, match_vibe=True)
    out = C.split_into_chunks(short, 4, 1, match_vibe=True)
    assert len(out) > 0


def test_combine_into_chunks_fuzz(ref_img, rng):
    for trial in range(120):
        seqlen = rng.randint(2, 7)
        # all clips >= seqlen: shorter clips hit the corruption divergence
        # pinned separately below
        names, _ = _layout(rng, rng.randint(1, 10), seqlen, 30)
        vidlen = rng.randint(seqlen + 1, 61)
        ours = C.combine_into_chunks(names, seqlen, vidlen)
        ref = ref_img.combine_into_chunks(names, seqlen, vidlen)
        ref = [item for item in ref if item]  # ref appends a possibly-empty
        # trailing item ([] when no videos survive); ours omits empties
        assert _as_int(list(ours)) == _as_int(list(ref)), (
            trial, seqlen, vidlen)


def test_combine_into_chunks_short_clip_divergence(ref_img):
    # 3 clips: the middle one is shorter than seqlen. The reference packs
    # it with negative timeline slots (extra_len <= 0), which would make
    # the 2-channel offset move BACKWARD and overwrite the previous clip's
    # frames at dataset-build time; ours drops it (chunking.py:120-126).
    seqlen, vidlen = 4, 50
    names = np.repeat(np.array(["a", "b", "c"]), [10, 2, 10])
    ours = C.combine_into_chunks(names, seqlen, vidlen)
    ref = ref_img.combine_into_chunks(names, seqlen, vidlen)
    assert _as_int(ours) == [[[0, 9], [12, 21]]]
    # the reference keeps the degenerate clip — pin that this is a REAL
    # behavioural difference, not a missed case
    assert _as_int(ref) == [[[0, 9], [10, 11], [12, 21]]]
