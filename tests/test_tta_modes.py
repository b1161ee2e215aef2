"""TTA schedule modes: rot_aug_360 and rot_aug_360_half (`multiperson_model.py:
141-159`), and rotflip matrix structure."""

import numpy as np

from metrabs_tpu.config import AugConfig
from metrabs_tpu.pipeline.tta import make_tta_params


def test_rot_360_mode():
    p = make_tta_params(6, AugConfig(rot_aug_360=True))
    # angles = linspace(-pi*(1-1/6), pi*(1-1/6), 6)
    rng = np.pi * (1 - 1 / 6)
    np.testing.assert_allclose(p.angles, np.linspace(-rng, rng, 6), atol=1e-6)


def test_rot_360_half_mode():
    p = make_tta_params(6, AugConfig(rot_aug_360_half=True, rot_aug_degrees=25))
    # First half: +-25deg over 3 augs; second half: 360-spread over 3 augs;
    # concatenated and sorted.
    normal = np.linspace(np.deg2rad(-25), np.deg2rad(25), 3)
    rng360 = np.pi * (1 - 1 / 3)
    full = np.linspace(-rng360, rng360, 3)
    expected = np.sort(np.concatenate([normal, full]))
    np.testing.assert_allclose(p.angles, expected, atol=1e-6)


def test_rotflip_matrices_are_valid():
    p = make_tta_params(5, AugConfig())
    for i in range(5):
        m = p.rotflip_mats[i]
        # Orthogonal with det -1 when flipped, +1 otherwise.
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        expected_det = -1.0 if p.should_flip[i] else 1.0
        np.testing.assert_allclose(np.linalg.det(m), expected_det, atol=1e-5)
    # Unflipped center aug with angle 0 is the identity.
    center = 5 // 2
    assert not p.should_flip[center]
    np.testing.assert_allclose(p.angles[center], 0, atol=1e-7)
    np.testing.assert_allclose(p.rotflip_mats[center], np.eye(3), atol=1e-6)
