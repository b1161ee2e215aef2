"""First-party detector training for the YOLOv4 family.

The reference never trains its person detector — it consumes an external
SavedModel (`metrabs_tf/multiperson/save_model.py:29`, `docs/TRAINING.md:64`).
This module adds the missing capability so the full
train -> package -> `detect_poses` loop can run on freshly minted weights:
a classic anchor-based single-stage objective (best-anchor assignment,
decoded-offset + log-size box regression, objectness BCE with
prediction-IoU ignore zones, per-class BCE) over the same raw head outputs
`decode_head` consumes at serving time, so a net trained here serves through
`PersonDetector` unchanged.

Assignment runs on the host per batch (numpy -> dense per-scale target
tensors), keeping the jitted loss purely elementwise with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metrabs_tpu.detect.yolov4 import (
    ANCHORS_TINY, STRIDES_TINY, XYSCALE_TINY, decode_head)


def _wh_iou(wh_a: np.ndarray, wh_b: np.ndarray) -> np.ndarray:
    """IoU of width/height pairs as if concentric: [n,2] x [m,2] -> [n,m]."""
    inter = (np.minimum(wh_a[:, None, 0], wh_b[None, :, 0])
             * np.minimum(wh_a[:, None, 1], wh_b[None, :, 1]))
    union = (wh_a[:, 0] * wh_a[:, 1])[:, None] \
        + (wh_b[:, 0] * wh_b[:, 1])[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def build_targets(
        boxes_per_image: Sequence[np.ndarray], input_size: int,
        num_classes: int = 80,
        class_ids_per_image: Optional[Sequence[np.ndarray]] = None,
        anchors: np.ndarray = ANCHORS_TINY,
        strides: Sequence[int] = STRIDES_TINY):
    """Dense training targets for a batch.

    boxes_per_image: per image an [m_i, 4] float array of (x, y, w, h)
    TOP-LEFT-format boxes in detector-input pixels (the format
    `PersonDetector.detect_batched` emits). Each ground-truth box is assigned
    to the single best wh-IoU anchor across all scales, at the grid cell
    containing its center.

    Returns (targets, obj_masks, gt_boxes_padded, gt_valid):
      targets[s]: [N, gh, gw, 3, 5] = (ox, oy, tw, th, class_id) where
        (ox, oy) is the in-cell center offset in [0, 1), (tw, th) the raw
        log-size regression target, class_id the integer class;
      obj_masks[s]: [N, gh, gw, 3] bool positive-assignment mask;
      gt_boxes_padded: [N, max_m, 4] CENTER-format boxes (for the ignore
        zones computed against decoded predictions inside the loss);
      gt_valid: [N, max_m] bool.
    """
    n = len(boxes_per_image)
    n_scales = len(strides)
    grids = [input_size // s for s in strides]
    anchors = np.asarray(anchors, np.float32) * (input_size / 416.0)
    flat_anchors = anchors.reshape(-1, 2)

    targets = [np.zeros((n, g, g, 3, 5), np.float32) for g in grids]
    obj_masks = [np.zeros((n, g, g, 3), bool) for g in grids]
    max_m = max((len(b) for b in boxes_per_image), default=1) or 1
    gt_boxes = np.zeros((n, max_m, 4), np.float32)
    gt_valid = np.zeros((n, max_m), bool)

    for i, boxes in enumerate(boxes_per_image):
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        cls = (np.asarray(class_ids_per_image[i], np.int64)
               if class_ids_per_image is not None
               else np.zeros(len(boxes), np.int64))
        for m, (x, y, w, h) in enumerate(boxes):
            cx, cy = x + w / 2, y + h / 2
            gt_boxes[i, m] = (cx, cy, w, h)
            gt_valid[i, m] = True
            best = int(np.argmax(_wh_iou(
                np.array([[w, h]], np.float32), flat_anchors)[0]))
            s, a = divmod(best, anchors.shape[1])
            g = grids[s]
            gx = min(int(cx / strides[s]), g - 1)
            gy = min(int(cy / strides[s]), g - 1)
            ox = cx / strides[s] - gx
            oy = cy / strides[s] - gy
            tw = np.log(max(w, 1e-3) / anchors[s, a, 0])
            th = np.log(max(h, 1e-3) / anchors[s, a, 1])
            targets[s][i, gy, gx, a] = (ox, oy, tw, th, float(cls[m]))
            obj_masks[s][i, gy, gx, a] = True
    return targets, obj_masks, gt_boxes, gt_valid


def _bce(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels)


def detection_loss(
        heads: Sequence[jnp.ndarray], targets, obj_masks, gt_boxes, gt_valid,
        *, input_size: int, num_classes: int = 80,
        anchors: np.ndarray = ANCHORS_TINY,
        strides: Sequence[int] = STRIDES_TINY,
        xyscale: Sequence[float] = XYSCALE_TINY,
        ignore_iou: float = 0.5, box_weight: float = 5.0,
        obj_weight: float = 1.0, cls_weight: float = 1.0) -> jnp.ndarray:
    """Total detection loss over all head scales (scalar, batch-mean)."""
    anchors_px = np.asarray(anchors, np.float32) * (input_size / 416.0)
    total = 0.0
    n_pos_total = 0.0
    for s, raw in enumerate(heads):
        raw = raw.astype(jnp.float32)
        n, gh, gw, _ = raw.shape
        raw = raw.reshape(n, gh, gw, 3, 5 + num_classes)
        tgt = targets[s]
        pos = obj_masks[s].astype(jnp.float32)
        n_pos_total = n_pos_total + jnp.sum(pos)

        # Box regression at positives: decoded in-cell offset (the exact
        # decode_head xy transform) vs target offset, raw log-size vs target.
        sc = xyscale[s]
        xy_pred = jax.nn.sigmoid(raw[..., 0:2]) * sc - 0.5 * (sc - 1)
        xy_loss = jnp.sum(jnp.square(xy_pred - tgt[..., 0:2]), axis=-1)
        wh_loss = jnp.sum(jnp.square(raw[..., 2:4] - tgt[..., 2:4]), axis=-1)
        total = total + box_weight * jnp.sum(pos * (xy_loss + wh_loss))

        # Objectness: positives -> 1; negatives -> 0 except ignore zones
        # where the decoded prediction already overlaps a GT box well
        # (standard darknet ignore, avoids punishing near-duplicates).
        decoded = decode_head(
            raw.reshape(n, gh, gw, -1), s, input_size,
            anchors=np.asarray(anchors), strides=tuple(strides),
            xyscale=tuple(xyscale))  # [n, gh*gw*3, 5+C]
        pb = decoded[..., :4]
        a_min = pb[..., None, :2] - pb[..., None, 2:4] / 2
        a_max = pb[..., None, :2] + pb[..., None, 2:4] / 2
        b_min = gt_boxes[:, None, :, :2] - gt_boxes[:, None, :, 2:4] / 2
        b_max = gt_boxes[:, None, :, :2] + gt_boxes[:, None, :, 2:4] / 2
        inter = jnp.prod(jnp.clip(
            jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0.0, None),
            axis=-1)
        area_a = jnp.prod(pb[..., 2:4], axis=-1)[..., None]
        area_b = jnp.prod(gt_boxes[:, None, :, 2:4], axis=-1)
        iou = inter / jnp.maximum(area_a + area_b - inter, 1e-9)
        iou = jnp.where(gt_valid[:, None, :], iou, 0.0)
        best_iou = jnp.max(iou, axis=-1).reshape(n, gh, gw, 3)
        ignore = (best_iou > ignore_iou).astype(jnp.float32) * (1.0 - pos)

        obj_logit = raw[..., 4]
        obj_loss = _bce(obj_logit, pos)
        total = total + obj_weight * jnp.sum(obj_loss * (1.0 - ignore))

        cls_labels = jax.nn.one_hot(tgt[..., 4].astype(jnp.int32), num_classes)
        cls_loss = jnp.sum(_bce(raw[..., 5:], cls_labels), axis=-1)
        total = total + cls_weight * jnp.sum(pos * cls_loss)
    return total / jnp.maximum(n_pos_total, 1.0)


@dataclasses.dataclass
class DetectorTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0


jax.tree_util.register_pytree_node(
    DetectorTrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.step), None),
    lambda _, c: DetectorTrainState(*c))


def create_detector_train_state(model, tx, rng, input_size: int,
                                dtype=jnp.float32) -> DetectorTrainState:
    variables = jax.jit(model.init, static_argnames='train')(
        rng, jnp.zeros((1, input_size, input_size, 3), dtype), train=True)
    params = variables['params']
    return DetectorTrainState(
        params=params, batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(params), step=0)


def make_detector_train_step(model, tx, *, input_size: int,
                             num_classes: int = 80,
                             loss_kwargs: Optional[dict] = None):
    """Returns step(state, images_f [N,S,S,3] in [0,1], targets, obj_masks,
    gt_boxes, gt_valid) -> (state, loss). Jit-compatible; targets come from
    `build_targets` (device-put by the caller or implicitly by jit)."""
    anchors, strides, xyscale = model.decode_tables()
    kwargs = dict(loss_kwargs or {})

    def step(state, images, targets, obj_masks, gt_boxes, gt_valid):
        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
                heads, mut = model.apply(
                    variables, images.astype(model.dtype), train=True,
                    mutable=['batch_stats'])
                new_bs = mut['batch_stats']
            else:
                heads = model.apply(variables, images.astype(model.dtype),
                                    train=True)
                new_bs = {}
            loss = detection_loss(
                heads, targets, obj_masks, gt_boxes, gt_valid,
                input_size=input_size, num_classes=num_classes,
                anchors=anchors, strides=strides, xyscale=xyscale, **kwargs)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return DetectorTrainState(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            step=state.step + 1), loss

    return step
