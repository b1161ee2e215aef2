import numpy as np
import jax.numpy as jnp
from scipy.stats import special_ortho_group

from metrabs_tpu.eval.metrics import auc_score, compute_pose3d_metrics
from metrabs_tpu.pipeline.skeletons import H36M_17


def test_perfect_prediction(rng):
    pose = jnp.asarray(rng.normal(size=(3, 17, 3)).astype(np.float32) * 200)
    mask = jnp.ones((3, 17), bool)
    m = compute_pose3d_metrics(pose, pose, mask, joint_info=H36M_17)
    assert float(m['mean_error']) < 1e-3
    assert float(m['mean_error_abs']) < 1e-3
    assert float(m['mean_error_procrustes']) < 1e-2
    assert float(m['mean_pck']) == 1.0
    assert float(m['ncps']) == 1.0
    assert float(m['mean_auc']) > 0.999


def test_constant_offset_rootrel_zero(rng):
    pose = jnp.asarray(rng.normal(size=(2, 17, 3)).astype(np.float32) * 200)
    offset = jnp.asarray(np.array([100.0, -50.0, 2000.0], np.float32))
    mask = jnp.ones((2, 17), bool)
    m = compute_pose3d_metrics(pose + offset, pose, mask)
    # Root-relative error is invariant to a constant offset...
    assert float(m['mean_error']) < 1e-2
    # ...but absolute error sees it.
    np.testing.assert_allclose(
        float(m['mean_error_abs']), np.linalg.norm(np.asarray(offset)), rtol=1e-4)


def test_procrustes_removes_rotation(rng):
    pose = rng.normal(size=(1, 17, 3)).astype(np.float32) * 200
    R = special_ortho_group.rvs(3, random_state=3).astype(np.float32)
    rotated = pose @ R.T
    mask = jnp.ones((1, 17), bool)
    m = compute_pose3d_metrics(jnp.asarray(rotated), jnp.asarray(pose), mask)
    assert float(m['mean_error']) > 10  # rotation hurts MPJPE
    assert float(m['mean_error_procrustes']) < 1e-2  # PA-MPJPE removes it


def test_pck_threshold(rng):
    pose = jnp.asarray(rng.normal(size=(1, 17, 3)).astype(np.float32) * 200)
    # Shift one joint by 400mm (rootrel shifts slightly, still way > 150).
    bad = np.asarray(pose).copy()
    bad[0, 0] += 400.0
    mask = jnp.ones((1, 17), bool)
    m = compute_pose3d_metrics(jnp.asarray(bad), pose, mask)
    assert 0.8 < float(m['mean_pck']) < 1.0
    assert float(m['ncps']) == 0.0  # one bad joint kills the whole pose for NCPS


def test_auc_score_values():
    x = jnp.asarray([0.0, 75.0, 150.0, 300.0])
    got = np.asarray(auc_score(x, 0.0, 150.0))
    np.testing.assert_allclose(got, [1.0, 0.5, 0.0, 0.0], atol=1e-6)


def test_wrist_metrics_present():
    pose = jnp.zeros((1, 17, 3))
    mask = jnp.ones((1, 17), bool)
    m = compute_pose3d_metrics(pose, pose, mask, joint_info=H36M_17)
    assert 'pck_wrists' in m and 'auc_wrists' in m
