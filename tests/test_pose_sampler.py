"""Adaptive pose sampler tests (`util3d.py:46-155` behavior)."""

import numpy as np
import pytest

from metrabs_tpu.utils.pose_sampler import (
    AdaptivePoseSampler, AdaptivePoseSampler2, RingBufferArray)


def _pose(offset):
    base = np.arange(17 * 3, dtype=np.float32).reshape(17, 3)
    return base + offset


@pytest.mark.parametrize('cls', [AdaptivePoseSampler, AdaptivePoseSampler2])
def test_keeps_first_and_moved_frames(cls):
    s = cls(thresh=100.0)
    assert not s.should_skip(_pose(0))        # first frame kept
    assert s.should_skip(_pose(10))           # 10*sqrt(3) mm < 100: skipped
    assert not s.should_skip(_pose(200))      # moved: kept
    # comparison base updated to the KEPT frame, not the skipped one
    assert s.should_skip(_pose(210))


@pytest.mark.parametrize('cls', [AdaptivePoseSampler, AdaptivePoseSampler2])
def test_all_nan_first_frame_skipped(cls):
    s = cls(thresh=100.0)
    assert s.should_skip(np.full((17, 3), np.nan))


@pytest.mark.parametrize('cls', [AdaptivePoseSampler, AdaptivePoseSampler2])
def test_newly_valid_joint_keeps_frame(cls):
    s = cls(thresh=100.0, check_validity=True)
    p0 = _pose(0)
    p0[5] = np.nan
    assert not s.should_skip(p0)
    p1 = _pose(1)          # tiny motion, but joint 5 became valid
    assert not s.should_skip(p1)


def test_nan_counts_as_motion_without_assume_flag():
    s = AdaptivePoseSampler(thresh=100.0)
    assert not s.should_skip(_pose(0))
    p = _pose(1)
    p[3] = np.nan          # NaN change -> `not all(change < t)` keeps
    assert not s.should_skip(p)


def test_assume_nan_unchanged_skips_nan_frames():
    s = AdaptivePoseSampler(thresh=100.0, assume_nan_unchanged=True)
    assert not s.should_skip(_pose(0))
    p = _pose(1)
    p[3] = np.nan          # NaN inherits previous value: no motion seen
    assert s.should_skip(p)
    # the NaN joint kept its old value in the reference pose
    assert np.isfinite(s.prev_pose).all()


def test_sampler2_ring_buffer_blocks_oscillation():
    """With buffer_size=2, alternating between two far-apart poses is skipped
    after both are buffered — motion must exceed thresh vs EVERY buffered
    pose."""
    s = AdaptivePoseSampler2(thresh=100.0, buffer_size=2)
    a, b = _pose(0), _pose(500)
    assert not s.should_skip(a)
    assert not s.should_skip(b)
    assert s.should_skip(a)    # close to buffered a
    assert s.should_skip(b)    # close to buffered b
    assert not s.should_skip(_pose(1000))


def test_ring_buffer_array():
    rb = RingBufferArray(2)
    rb.add(np.ones((3,), np.float32))
    np.testing.assert_array_equal(rb.last_item(), [1, 1, 1])
    assert np.isnan(rb.array).sum() == 3  # second slot still NaN-padded
    rb.add(np.full((3,), 2, np.float32))
    rb.add(np.full((3,), 3, np.float32))  # wraps, overwrites slot 0
    np.testing.assert_array_equal(rb.last_item(), [3, 3, 3])
    np.testing.assert_array_equal(sorted(rb.array[:, 0]), [2, 3])


def test_ring_buffer_copy_last_if_nan():
    rb = RingBufferArray(1, copy_last_if_nan=True)
    rb.add(np.array([1.0, 2.0], np.float32))
    rb.add(np.array([np.nan, 5.0], np.float32))
    np.testing.assert_array_equal(rb.last_item(), [1.0, 5.0])


# ---------------------------------------------------------------------------
# Executed-reference oracle: identical skip-decision SEQUENCES on randomized
# pose streams (`util3d.py:46-155` run directly; TF-free import).


@pytest.mark.parametrize('check_validity', [False, True])
@pytest.mark.parametrize('assume_nan', [False, True])
@pytest.mark.oracle
def test_adaptive_sampler_matches_reference(check_validity, assume_nan):
    from tests import _reference_oracle
    ref = _reference_oracle.load_reference_util3d()

    rng = np.random.default_rng(3)
    ours = AdaptivePoseSampler(100.0, check_validity, assume_nan)
    theirs = ref.AdaptivePoseSampler(100.0, check_validity, assume_nan)
    pose = rng.normal(size=(17, 3)) * 1000
    for t in range(60):
        pose = pose + rng.normal(size=(17, 3)) * rng.choice([5.0, 80.0])
        shown = pose.copy()
        if rng.uniform() < 0.3:  # sprinkle NaN invalidity patterns
            shown[rng.integers(0, 17, size=4)] = np.nan
        assert (ours.should_skip(shown.copy())
                == theirs.should_skip(shown.copy())), f'step {t}'


@pytest.mark.parametrize('buffer_size', [1, 4])
@pytest.mark.oracle
def test_adaptive_sampler2_matches_reference(buffer_size):
    from tests import _reference_oracle
    ref = _reference_oracle.load_reference_util3d()

    rng = np.random.default_rng(9)
    ours = AdaptivePoseSampler2(
        100.0, check_validity=True, assume_nan_unchanged=True,
        buffer_size=buffer_size)
    theirs = ref.AdaptivePoseSampler2(
        100.0, check_validity=True, assume_nan_unchanged=True,
        buffer_size=buffer_size)
    pose = rng.normal(size=(17, 3)) * 1000
    for t in range(80):
        pose = pose + rng.normal(size=(17, 3)) * rng.choice([5.0, 60.0])
        shown = pose.copy()
        if rng.uniform() < 0.3:
            shown[rng.integers(0, 17, size=4)] = np.nan
        assert (ours.should_skip(shown.copy())
                == theirs.should_skip(shown.copy())), f'step {t}'
