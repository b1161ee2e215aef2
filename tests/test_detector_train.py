"""First-party detector training (`detect/train.py`): target assignment
semantics and end-to-end loss descent on a tiny case.

The reference never trains its detector (external SavedModel,
`save_model.py:29`); these tests pin our training objective against the
serving decode (`decode_head`) it must stay consistent with.
"""

import numpy as np
import pytest

from metrabs_tpu.detect.train import (
    build_targets, create_detector_train_state, detection_loss,
    make_detector_train_step)
from metrabs_tpu.detect.yolov4 import ANCHORS_TINY, STRIDES_TINY

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'



def test_build_targets_assignment():
    input_size = 416
    # A box exactly matching anchor (scale 1, anchor 1) = 135x169 px,
    # centered at (100.5, 50.25): cell (6, 3) at stride 16... the best
    # wh-IoU anchor decides the SCALE too, so compute it explicitly.
    w, h = 135.0, 169.0
    cx, cy = 100.5, 50.25
    boxes = [np.array([[cx - w / 2, cy - h / 2, w, h]], np.float32)]
    targets, masks, gtb, gtv = build_targets(boxes, input_size)

    # anchor (1, 1) matches exactly -> scale 1 (stride 32).
    s, a = 1, 1
    g = input_size // STRIDES_TINY[s]
    gx, gy = int(cx / STRIDES_TINY[s]), int(cy / STRIDES_TINY[s])
    assert masks[s][0, gy, gx, a]
    assert masks[s].sum() + masks[0].sum() == 1  # single positive
    t = targets[s][0, gy, gx, a]
    np.testing.assert_allclose(
        t[0], cx / STRIDES_TINY[s] - gx, rtol=1e-6)
    np.testing.assert_allclose(
        t[1], cy / STRIDES_TINY[s] - gy, rtol=1e-6)
    np.testing.assert_allclose(t[2:4], 0.0, atol=1e-6)  # log(w/anchor_w)=0
    # GT padding is center-format.
    np.testing.assert_allclose(gtb[0, 0], [cx, cy, w, h], rtol=1e-6)
    assert gtv[0, 0] and gtv.shape == (1, 1)


def test_build_targets_clips_edge_cells():
    input_size = 416
    # Center exactly on the right image edge must clip into the last cell.
    boxes = [np.array([[415, 415, 2, 2]], np.float32)]
    targets, masks, _, _ = build_targets(boxes, input_size)
    total = sum(int(m.sum()) for m in masks)
    assert total == 1
    s = 0 if masks[0].any() else 1
    g = input_size // STRIDES_TINY[s]
    ys, xs, _ = np.nonzero(masks[s][0])
    assert xs[0] == g - 1 and ys[0] == g - 1


def test_detection_loss_runs_and_is_finite():
    rng = np.random.default_rng(0)
    input_size = 64
    heads = [rng.normal(size=(2, input_size // s, input_size // s,
                              3 * 85)).astype(np.float32) * 0.1
             for s in STRIDES_TINY]
    boxes = [np.array([[10, 10, 20, 30]], np.float32),
             np.zeros((0, 4), np.float32)]  # one empty image
    targets, masks, gtb, gtv = build_targets(boxes, input_size)
    loss = detection_loss(heads, targets, masks, gtb, gtv,
                          input_size=input_size)
    assert np.isfinite(float(loss))


def test_detector_training_reduces_loss():
    import jax
    import jax.numpy as jnp
    import optax

    from metrabs_tpu.detect.yolov4 import YOLOv4Tiny

    input_size = 64
    model = YOLOv4Tiny(dtype=jnp.float32)
    tx = optax.adam(2e-3)
    state = create_detector_train_state(
        model, tx, jax.random.PRNGKey(0), input_size)
    step = jax.jit(make_detector_train_step(model, tx,
                                            input_size=input_size))

    rng = np.random.default_rng(1)
    image = rng.uniform(0, 1, (2, input_size, input_size, 3)).astype(
        np.float32)
    boxes = [np.array([[8, 8, 24, 36]], np.float32),
             np.array([[30, 20, 20, 28]], np.float32)]
    targets, masks, gtb, gtv = build_targets(boxes, input_size)
    args = (jnp.asarray(image), [jnp.asarray(t) for t in targets],
            [jnp.asarray(m) for m in masks], jnp.asarray(gtb),
            jnp.asarray(gtv))
    losses = []
    for _ in range(12):
        state, loss = step(state, *args)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses
    assert state.step == 12
