"""Multi-person matched-metrics protocol (MuPoTS-style)."""

import numpy as np

from metrabs_tpu.eval.harness import JOINT_SUBSETS, matched_pose_metrics
from metrabs_tpu.pipeline.skeletons import H36M_17


def test_matched_metrics(rng):
    g1 = rng.normal(size=(17, 3)) * 200
    g2 = g1 + [2000, 0, 0]
    preds = [
        # frame 1: both found, order swapped, 20mm noise
        np.stack([g2 + rng.normal(size=(17, 3)) * 20,
                  g1 + rng.normal(size=(17, 3)) * 20]),
        # frame 2: one person missed
        np.stack([g1 + rng.normal(size=(17, 3)) * 20])]
    gts = [np.stack([g1, g2]), np.stack([g1, g2])]
    m = matched_pose_metrics(preds, gts)
    assert m['recall'] == 0.75
    assert 0.6 < m['matched_pck'] <= 0.75  # misses count as incorrect joints


def test_matched_metrics_empty_frames():
    m = matched_pose_metrics([np.zeros((0, 17, 3))], [np.zeros((0, 17, 3))])
    assert m['recall'] == 0.0 and m['matched_pck'] == 0.0


def test_lsp14_subset_names():
    idx = JOINT_SUBSETS['lsp_14_of_h36m17']
    names = [H36M_17.names[i] for i in idx]
    assert names == ['rank', 'rkne', 'rhip', 'lhip', 'lkne', 'lank',
                     'rwri', 'relb', 'rsho', 'lsho', 'lelb', 'lwri',
                     'neck', 'htop']
