"""End-to-end verification drive on the real TPU: the public PoseEstimator
API with the real sample image, exercising the GroupNorm ResNet crop model,
TTA aug axis, degenerate boxes, skeleton gather, and the fused
detect_poses_batched path with a bf16 YOLOv4-tiny detector. Prints VERIFY OK
on success. First run compiles ~5-10 min over the tunnel; cached reruns ~3
min (persistent cache at /root/.cache/jax_comp_cache).

  python scripts/verify_e2e.py
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from PIL import Image
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import time
_t0=time.time()
def tick(msg):
    print(f"[{time.time()-_t0:7.1f}s] {msg}", flush=True)

# Backend-init watchdog: with the tunnel down, jax.devices() blocks forever
# inside backend setup (healthy init takes seconds). Bound it so the drive
# fails fast and attributably instead of hanging (same guard as bench.py).
import threading
_init_done = threading.Event()
def _watchdog():
    timeout = int(os.environ.get('VERIFY_INIT_TIMEOUT', '300'))
    if not _init_done.wait(timeout):
        print(f'verify: TPU backend init did not complete within {timeout}s '
              f'(tunnel unavailable?); aborting', file=sys.stderr, flush=True)
        os._exit(2)
threading.Thread(target=_watchdog, daemon=True).start()
print(jax.devices())
_init_done.set()

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.models.backbones.builder import build_backbone
from metrabs_tpu.models.metrabs import Metrabs
from metrabs_tpu.pipeline.estimator import PoseEstimator
from metrabs_tpu.pipeline import bone_priors
from metrabs_tpu.pipeline.skeletons import H36M_17
from metrabs_tpu.detect.yolov4 import YOLOv4Tiny, PersonDetector

img = np.asarray(Image.open('/root/reference/test_image_3dpw.jpg'))
print('image', img.shape)

# Crop model on the NEW groupnorm ResNet variant (this session's change).
cfg = ModelConfig(proc_side=256, depth=8, n_joints=17, dtype='bfloat16',
                  backbone='resnet50v1-5-groupnorm')
model = Metrabs(cfg=cfg,
                backbone=build_backbone('resnet50v1-5-groupnorm'))
params = jax.jit(model.init)(
    {'params': jax.random.PRNGKey(0)},
    jnp.zeros((1, 256, 256, 3), jnp.bfloat16), jnp.eye(3)[None])
tick('init done')
crop_fn = lambda c, k, v: model.apply(params, c, k, train=False,
                                      sample_valid=v)
est = PoseEstimator(crop_fn, H36M_17, cfg,
                    bone_mean_lengths=bone_priors.priors_for_joint_info(H36M_17))
boxes = np.array([[230, 340, 280, 700], [620, 310, 330, 750],
                  [0, 0, 0, 0]], np.float32)
tick('estimate_poses start')
out = est.estimate_poses(img, boxes, num_aug=2, average_aug=False)
p = np.asarray(out['poses3d'])
print('estimate_poses (GN resnet, aug axis, degenerate box):',
      p.shape, 'finite:', bool(np.all(np.isfinite(p))))
assert p.shape == (3, 2, 17, 3), p.shape
assert np.all(np.isfinite(p)), 'non-finite poses from estimate_poses'

tick('first done')
out14 = est.estimate_poses(img, boxes[:2], num_aug=2, skeleton='lsp_14')
print('lsp_14:', np.asarray(out14['poses3d']).shape)
assert np.asarray(out14['poses3d']).shape == (2, 14, 3)

# Detector path with the NEW bf16 compute dtype (this session's change).
tick('lsp done')
det_model = YOLOv4Tiny(num_classes=80, dtype=jnp.bfloat16)
det_vars = jax.jit(lambda: det_model.init(
    jax.random.PRNGKey(1), jnp.zeros((1, 416, 416, 3), jnp.float32),
    train=False))()
det = PersonDetector(det_model, det_vars, input_size=416)
est2 = PoseEstimator(crop_fn, H36M_17, cfg, detector=det,
                     bone_mean_lengths=bone_priors.priors_for_joint_info(H36M_17))
tick('det init done')
out2 = est2.detect_poses_batched(
    jnp.asarray(img)[None], num_aug=2, max_detections=4,
    detector_threshold=0.0)
p2 = np.asarray(out2['poses3d'])
v2 = np.asarray(out2['valid']).astype(bool)
finite_at_valid = bool(np.all(np.isfinite(p2[v2])))
print('detect_poses_batched (bf16 tiny detector):', p2.shape,
      'valid:', int(v2.sum()), 'finite-at-valid ok:', finite_at_valid)
assert p2.shape == (1, 4, 17, 3), p2.shape
assert finite_at_valid, 'non-finite poses at valid detection rows'
assert sorted(out2.keys()) == ['boxes', 'poses2d', 'poses3d', 'valid']
print('keys:', sorted(out2.keys()))

tick('stream start')
imgs_k = jnp.stack([jnp.asarray(img), jnp.asarray(img)])[:, None]
out3 = est2.detect_poses_stream(imgs_k, num_aug=2, max_detections=4,
                                detector_threshold=0.0)
p3 = np.asarray(out3['poses3d'])
slices_equal = bool(np.allclose(p3[0], p3[1], equal_nan=True))
print('detect_poses_stream (K=2):', p3.shape, 'slices equal:', slices_equal)
assert p3.shape == (2, 1, 4, 17, 3), p3.shape
assert slices_equal, 'stream slices for identical frames diverged'
# VERIFY OK is gated by every assert above: it only prints if all
# checks actually passed (a crash or assert never reaches it).
print('VERIFY OK')
