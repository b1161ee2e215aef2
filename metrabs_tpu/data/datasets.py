"""Dataset adapters: benchmark annotation formats -> Example3D lists.

The reference delegates dataset handling to its external `posepile` package;
here the adapters for the evaluation benchmarks are first-party. Each
function reads the dataset's published annotation format and yields
`Example3D` objects consumable by `eval/harness.predict_dataset` and the
training loaders.

Only the formats loadable with in-image dependencies are implemented in code
(3DPW sequence pickles, MuPoTS matlab annotations, generic NPZ); H36M's CDF
ground truth requires spacepy — its adapter accepts the widely-used
preprocessed NPZ layout instead.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Iterator, List, Optional, Sequence

import numpy as np

from metrabs_tpu.data.camera import Camera
from metrabs_tpu.data.loading import Example3D
from metrabs_tpu.utils import matlabfile


def boxes_from_joints(imcoords: np.ndarray, margin: float = 0.1) -> np.ndarray:
    valid = ~np.any(np.isnan(imcoords), axis=-1)
    pts = imcoords[valid]
    x0, y0 = pts.min(0)
    x1, y1 = pts.max(0)
    w, h = x1 - x0, y1 - y0
    m = margin * max(w, h)
    return np.array([x0 - m, y0 - m, w + 2 * m, h + 2 * m], np.float32)


def load_3dpw_examples(
        root: str, split: str = 'test',
        image_subdir: str = 'imageFiles') -> List[Example3D]:
    """3DPW sequence pickles (`sequenceFiles/<split>/*.pkl`): SMPL 24-joint
    world positions in meters, per-frame extrinsics, shared intrinsics."""
    examples = []
    for path in sorted(glob.glob(os.path.join(root, 'sequenceFiles', split, '*.pkl'))):
        with open(path, 'rb') as f:
            seq = pickle.load(f, encoding='latin1')
        seq_name = seq['sequence']
        K = np.asarray(seq['cam_intrinsics'], np.float32)
        jp = [np.asarray(j).reshape(-1, 24, 3) * 1000.0
              for j in seq['jointPositions']]  # per track: [n_frames, 24, 3] mm
        cam_poses = np.asarray(seq['cam_poses'], np.float32)  # [n_frames, 4, 4]
        valid = np.asarray(seq['campose_valid'])
        for i_frame in range(cam_poses.shape[0]):
            ext = cam_poses[i_frame].copy()
            ext[:3, 3] *= 1000.0  # meters -> millimeters
            cam = Camera(extrinsic_matrix=ext, intrinsic_matrix=K,
                         world_up=(0, 1, 0))
            img_path = os.path.join(
                root, image_subdir, seq_name, f'image_{i_frame:05d}.jpg')
            for i_track, track in enumerate(jp):
                if i_frame >= len(track):
                    continue
                if valid.ndim == 2 and not valid[i_track, i_frame]:
                    continue
                world = track[i_frame]
                imcoords = cam.world_to_image(world)
                if np.all(np.isnan(imcoords)):
                    continue
                examples.append(Example3D(
                    image_path=img_path, camera=cam,
                    bbox=boxes_from_joints(imcoords), world_coords=world))
    return examples


def load_mupots_examples(root: str) -> List[Example3D]:
    """MuPoTS-3D: per-sequence `annot.mat` with annot[frame][person]
    (annot3/univ_annot3 in mm camera space, annot2 pixels, isValidFrame)."""
    examples = []
    for i_seq in range(1, 21):
        seq_dir = os.path.join(root, f'TS{i_seq}')
        annot_path = os.path.join(seq_dir, 'annot.mat')
        if not os.path.exists(annot_path):
            continue
        data = matlabfile.load(annot_path)
        annotations = np.atleast_2d(data['annotations'])
        # MuPoTS test intrinsics (published camera calibrations).
        K = np.array([[1500.9799, 0, 1024.704],
                      [0, 1500.9633, 1051.3849], [0, 0, 1]], np.float32) \
            if i_seq <= 5 else \
            np.array([[1683.9846, 0, 939.6174],
                      [0, 1672.9968, 560.2072], [0, 0, 1]], np.float32)
        cam = Camera(intrinsic_matrix=K, world_up=(0, -1, 0))
        n_frames, n_people = annotations.shape
        for i_frame in range(n_frames):
            img_path = os.path.join(seq_dir, f'img_{i_frame:06d}.jpg')
            for i_person in range(n_people):
                ann = annotations[i_frame, i_person]
                if isinstance(ann, dict):
                    if not np.all(ann.get('isValidFrame', 1)):
                        continue
                    camcoords = np.asarray(ann['annot3'], np.float32).T
                    imcoords = np.asarray(ann['annot2'], np.float32).T
                    examples.append(Example3D(
                        image_path=img_path, camera=cam,
                        bbox=boxes_from_joints(imcoords),
                        world_coords=camcoords))  # camera frame == world here
    return examples


def load_npz_examples(path: str, image_root: str = '') -> List[Example3D]:
    """Generic preprocessed NPZ: arrays image_path [N], world_coords [N,J,3]
    (mm), intrinsics [N,3,3], extrinsics [N,4,4] (optional), bbox [N,4]
    (optional) — the common interchange format for H36M/3DHP preprocessed
    annotations."""
    data = np.load(path, allow_pickle=True)
    n = len(data['image_path'])
    exts = data['extrinsics'] if 'extrinsics' in data else None
    bboxes = data['bbox'] if 'bbox' in data else None
    examples = []
    for i in range(n):
        cam = Camera(
            intrinsic_matrix=np.asarray(data['intrinsics'][i], np.float32),
            extrinsic_matrix=(np.asarray(exts[i], np.float32)
                              if exts is not None else None),
            world_up=(0, -1, 0))
        world = np.asarray(data['world_coords'][i], np.float32)
        bbox = (np.asarray(bboxes[i], np.float32) if bboxes is not None
                else boxes_from_joints(cam.world_to_image(world)))
        examples.append(Example3D(
            image_path=os.path.join(image_root, str(data['image_path'][i])),
            camera=cam, bbox=bbox, world_coords=world))
    return examples
