"""YOLOv4 person detector in JAX/flax.

The reference consumes an external YOLOv4-416 TF SavedModel
(github.com/isarandi/tensorflow-yolov4-tflite fork, `docs/TRAINING.md:64`;
loaded at `metrabs_tf/multiperson/save_model.py:29`); the PyTorch port uses
ultralytics YOLOv8 (`metrabs_pytorch/multiperson/person_detector.py:12`).
Here the detector is first-party: CSPDarknet53 + SPP + PANet + three anchor
heads, built in darknet-cfg order so the original `yolov4.weights` release
file can be imported directly (`load_darknet_weights`).

TPU-first notes: the whole detector is one jitted forward; all three scales
decode into a single padded [n_anchors_total, 5+C] tensor and NMS is the same
fixed-shape greedy loop as the pose NMS — no dynamic shapes anywhere, so
detection composes into the fused detect_poses graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.ops.nms import greedy_nms

# COCO-trained YOLOv4 anchors (pixels at 416 input) and decode scales, per the
# reference detector's tflite repo conventions.
ANCHORS = np.array(
    [[(12, 16), (19, 36), (40, 28)],
     [(36, 75), (76, 55), (72, 146)],
     [(142, 110), (192, 243), (459, 401)]], np.float32)
STRIDES = (8, 16, 32)
XYSCALE = (1.2, 1.1, 1.05)
NUM_CLASSES = 80
PERSON_CLASS = 0

# YOLOv4-tiny decode tables (the y4t configurations,
# `docs/MODELS_6_DATASETS.md:17-18`). Two heads: stride 16 uses anchor mask
# (1,2,3) — the canonical cfg quirk where anchor 81x82 appears in BOTH masks —
# and stride 32 uses (3,4,5) of the 6 tiny anchors.
ANCHORS_TINY = np.array(
    [[(23, 27), (37, 58), (81, 82)],
     [(81, 82), (135, 169), (344, 319)]], np.float32)
STRIDES_TINY = (16, 32)
XYSCALE_TINY = (1.05, 1.05)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class ConvBlock(nn.Module):
    """darknet 'convolutional' section: conv + optional BN + activation.
    Named sequentially (conv_<i>) in cfg order for weight import."""

    filters: int
    kernel: int
    stride: int = 1
    activation: str = 'leaky'  # 'mish' | 'leaky' | 'linear'
    use_bn: bool = True
    # Inference-only folded-BN layout (io/bn_fold.py): the conv carries a
    # bias and the BN op is skipped; variables from fold_bn_variables.
    bn_fold: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 2:
            # darknet pads top-left for strided convs (zero pad (1,0)).
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
            padding = 'VALID'
        else:
            padding = 'SAME'
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=padding,
                    use_bias=(not self.use_bn) or self.bn_fold,
                    dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv')(x)
        if self.use_bn and not self.bn_fold:
            x = nn.BatchNorm(use_running_average=True, momentum=0.99,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name='bn')(x)
        if self.activation == 'mish':
            x = mish(x)
        elif self.activation == 'leaky':
            x = nn.leaky_relu(x, 0.1)
        return x


class _ResScanBody(nn.Module):
    """Scan body for repeated CSP residual blocks (weights stacked)."""
    f1: int
    f2: int
    dtype: Any
    train: bool
    bn_fold: bool = False

    @nn.compact
    def __call__(self, carry, _):
        shortcut = carry
        x = ConvBlock(filters=self.f1, kernel=1, activation='mish',
                      bn_fold=self.bn_fold,
                      dtype=self.dtype, name='conv_a')(carry, self.train)
        x = ConvBlock(filters=self.f2, kernel=3, activation='mish',
                      bn_fold=self.bn_fold,
                      dtype=self.dtype, name='conv_b')(x, self.train)
        return shortcut + x, None


class YOLOv4(nn.Module):
    """Full YOLOv4: [N, S, S, 3] float in [0,1] -> per-scale raw head outputs.

    Convolutions are instantiated strictly in darknet cfg order; `conv_93`,
    `conv_101`, `conv_109` are the three output convs (bias, no BN), matching
    the canonical weight-file layout. With scan_repeats (default), the
    repeated CSP residual blocks are ONE nn.scan module each (named
    `res_scan_<first_conv_idx>_<n>`; conv numbering of everything else is
    unchanged) — compile-time win; `load_darknet_weights` targets the flat
    layout (scan_repeats=False) and `yolo_flat_to_scanned` converts.
    """

    num_classes: int = NUM_CLASSES
    dtype: Any = jnp.float32
    scan_repeats: bool = True
    # Inference-only folded-BN serving layout (io/bn_fold.py).
    bn_fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bn_fold and train:
            raise ValueError('bn_fold is an inference-only layout')
        counter = [0]

        def next_idx():
            i = counter[0]
            counter[0] += 1
            return i

        def conv(x, filters, kernel, stride=1, act='mish', bn=True):
            return ConvBlock(
                filters=filters, kernel=kernel, stride=stride, activation=act,
                use_bn=bn, bn_fold=self.bn_fold, dtype=self.dtype,
                name=f'conv_{next_idx()}')(x, train)

        def res_block(x, f1, f2, act='mish'):
            shortcut = x
            x = conv(x, f1, 1, act=act)
            x = conv(x, f2, 3, act=act)
            return shortcut + x

        def res_blocks(x, n_blocks, f1, f2):
            if self.scan_repeats and n_blocks >= 2:
                start = counter[0]
                counter[0] += 2 * n_blocks  # keep downstream numbering stable
                scanned = nn.scan(
                    _ResScanBody,
                    variable_axes={'params': 0, 'batch_stats': 0},
                    split_rngs={'params': True},
                    length=n_blocks,
                    metadata_params={nn.PARTITION_NAME: None})(
                    f1=f1, f2=f2, dtype=self.dtype, train=train,
                    bn_fold=self.bn_fold,
                    name=f'res_scan_{start}_{n_blocks}')
                x, _ = scanned(x, None)
                return x
            for _ in range(n_blocks):
                x = res_block(x, f1, f2)
            return x

        def csp_stage(x, down_filters, n_blocks, res_f1, res_f2, out_filters,
                      split_filters):
            x = conv(x, down_filters, 3, stride=2)
            route = conv(x, split_filters, 1)
            x = conv(x, split_filters, 1)
            x = res_blocks(x, n_blocks, res_f1, res_f2)
            x = conv(x, split_filters, 1)
            x = jnp.concatenate([x, route], axis=-1)
            return conv(x, out_filters, 1)

        # --- CSPDarknet53 backbone (mish) ---
        x = conv(x, 32, 3)
        # stage 1 (special: split width 64, residual 32->64)
        x = conv(x, 64, 3, stride=2)
        route = conv(x, 64, 1)
        x = conv(x, 64, 1)
        x = res_block(x, 32, 64)
        x = conv(x, 64, 1)
        x = jnp.concatenate([x, route], axis=-1)
        x = conv(x, 64, 1)
        # stages 2-5
        x = csp_stage(x, 128, 2, 64, 64, 128, 64)
        x = csp_stage(x, 256, 8, 128, 128, 256, 128)
        route_1 = x  # stride 8, 256ch
        x = csp_stage(x, 512, 8, 256, 256, 512, 256)
        route_2 = x  # stride 16, 512ch
        x = csp_stage(x, 1024, 4, 512, 512, 1024, 512)

        # --- SPP (leaky from here on) ---
        x = conv(x, 512, 1, act='leaky')
        x = conv(x, 1024, 3, act='leaky')
        x = conv(x, 512, 1, act='leaky')
        pools = [nn.max_pool(x, (k, k), strides=(1, 1), padding='SAME')
                 for k in (13, 9, 5)]
        x = jnp.concatenate(pools + [x], axis=-1)
        x = conv(x, 512, 1, act='leaky')
        x = conv(x, 1024, 3, act='leaky')
        x = conv(x, 512, 1, act='leaky')
        route_3 = x  # stride 32, 512ch

        # --- PANet top-down ---
        x = conv(route_3, 256, 1, act='leaky')
        x = jax.image.resize(x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2,
                                 x.shape[3]), method='nearest')
        r2 = conv(route_2, 256, 1, act='leaky')
        x = jnp.concatenate([r2, x], axis=-1)
        for f, k in [(256, 1), (512, 3), (256, 1), (512, 3), (256, 1)]:
            x = conv(x, f, k, act='leaky')
        route_16 = x
        x = conv(x, 128, 1, act='leaky')
        x = jax.image.resize(x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2,
                                 x.shape[3]), method='nearest')
        r1 = conv(route_1, 128, 1, act='leaky')
        x = jnp.concatenate([r1, x], axis=-1)
        for f, k in [(128, 1), (256, 3), (128, 1), (256, 3), (128, 1)]:
            x = conv(x, f, k, act='leaky')
        route_8 = x

        n_out = 3 * (5 + self.num_classes)
        # small-object head (stride 8); output conv = conv_93
        sb = conv(route_8, 256, 3, act='leaky')
        sbbox = conv(sb, n_out, 1, act='linear', bn=False)

        # bottom-up path
        x = conv(route_8, 256, 3, stride=2, act='leaky')
        x = jnp.concatenate([x, route_16], axis=-1)
        for f, k in [(256, 1), (512, 3), (256, 1), (512, 3), (256, 1)]:
            x = conv(x, f, k, act='leaky')
        route_16b = x
        mb = conv(x, 512, 3, act='leaky')
        mbbox = conv(mb, n_out, 1, act='linear', bn=False)

        x = conv(route_16b, 512, 3, stride=2, act='leaky')
        x = jnp.concatenate([x, route_3], axis=-1)
        for f, k in [(512, 1), (1024, 3), (512, 1), (1024, 3), (512, 1)]:
            x = conv(x, f, k, act='leaky')
        lb = conv(x, 1024, 3, act='leaky')
        lbbox = conv(lb, n_out, 1, act='linear', bn=False)

        return sbbox, mbbox, lbbox

    def decode_tables(self):
        return ANCHORS, STRIDES, XYSCALE


class YOLOv4Tiny(nn.Module):
    """YOLOv4-tiny: CSPOSANet backbone + two-scale head, all leaky-relu.

    Architecture per the tiny variant of the tflite fork the reference loads
    (`metrabs_tf/multiperson/save_model.py:29`, y4t rows of
    `docs/MODELS_6_DATASETS.md:17-18`): 21 conv sections in darknet cfg order
    (conv_0..conv_20, output convs conv_17 stride-32 and conv_20 stride-16),
    so `load_darknet_weights` imports the released `yolov4-tiny.weights`
    directly. Returns (mbbox, lbbox) raw head outputs matching
    STRIDES_TINY=(16, 32) decode order.
    """

    num_classes: int = NUM_CLASSES
    dtype: Any = jnp.float32
    # Inference-only folded-BN serving layout (io/bn_fold.py).
    bn_fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bn_fold and train:
            raise ValueError('bn_fold is an inference-only layout')
        counter = [0]

        def conv(x, filters, kernel, stride=1, act='leaky', bn=True):
            i = counter[0]
            counter[0] += 1
            return ConvBlock(
                filters=filters, kernel=kernel, stride=stride, activation=act,
                use_bn=bn, bn_fold=self.bn_fold, dtype=self.dtype,
                name=f'conv_{i}')(x, train)

        def csp_osa_block(x, f):
            # cfg: conv f 3x3; route groups=2 group_id=1 (second channel
            # half); conv f/2 3x3; conv f/2 3x3; route -1,-2; conv f 1x1;
            # route -6,-1; maxpool 2x2/2.
            full = conv(x, f, 3)
            half = full[..., f // 2:]
            a = conv(half, f // 2, 3)
            b = conv(a, f // 2, 3)
            feat = conv(jnp.concatenate([b, a], axis=-1), f, 1)
            merged = jnp.concatenate([full, feat], axis=-1)
            return nn.max_pool(merged, (2, 2), strides=(2, 2)), feat

        x = conv(x, 32, 3, stride=2)
        x = conv(x, 64, 3, stride=2)
        x, _ = csp_osa_block(x, 64)
        x, _ = csp_osa_block(x, 128)
        x, feat16 = csp_osa_block(x, 256)  # feat16 = conv_13 (stride 16)

        n_out = 3 * (5 + self.num_classes)
        x = conv(x, 512, 3)
        r = conv(x, 256, 1)
        lb = conv(r, 512, 3)
        lbbox = conv(lb, n_out, 1, act='linear', bn=False)  # conv_17

        x = conv(r, 128, 1)
        x = jax.image.resize(
            x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
            method='nearest')
        x = jnp.concatenate([x, feat16], axis=-1)  # route -1,23
        mb = conv(x, 256, 3)
        mbbox = conv(mb, n_out, 1, act='linear', bn=False)  # conv_20

        return mbbox, lbbox

    def decode_tables(self):
        return ANCHORS_TINY, STRIDES_TINY, XYSCALE_TINY


def build_detector_model(kind: str, dtype=jnp.float32, scan_repeats: bool = True,
                         bn_fold: bool = False):
    """Constructs the detector module for a registry `detector` string.

    `bn_fold`: inference-only folded-BN serving layout (io/bn_fold.py;
    darknet BN epsilon 1e-5). Supported for the YOLOv4 family."""
    if kind == 'yolov4':
        return YOLOv4(dtype=dtype, scan_repeats=scan_repeats, bn_fold=bn_fold)
    if kind == 'yolov4-tiny':
        return YOLOv4Tiny(dtype=dtype, bn_fold=bn_fold)
    if kind.startswith('yolov8') and kind[-1] in 'nsmlx' and len(kind) == 7:
        # The PT reference stack's detector family
        # (`person_detector.py:12` uses yolov8m).
        if bn_fold:
            raise ValueError('bn_fold is not wired for YOLOv8 yet')
        from metrabs_tpu.detect.yolov8 import YOLOv8
        return YOLOv8(size=kind[-1], dtype=dtype)
    raise ValueError(f'Unknown detector kind {kind!r}')


def decode_head(raw: jnp.ndarray, scale_idx: int, input_size: int,
                anchors: np.ndarray = ANCHORS,
                strides: Sequence[int] = STRIDES,
                xyscale: Sequence[float] = XYSCALE) -> jnp.ndarray:
    """Decodes one head's raw output to [N, n_anchors, 4+1+C]:
    (cx, cy, w, h) in input pixels, objectness, class probs.

    Decode always runs in float32 regardless of the net's compute dtype:
    box coordinates span up to `input_size` pixels, and bf16's 8-bit
    mantissa would quantize centers to ~1-2 px."""
    raw = raw.astype(jnp.float32)
    n, gh, gw, _ = raw.shape
    raw = raw.reshape(n, gh, gw, 3, -1)
    txy = raw[..., 0:2]
    twh = raw[..., 2:4]
    conf = jax.nn.sigmoid(raw[..., 4:5])
    probs = jax.nn.sigmoid(raw[..., 5:])

    grid_x = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    grid = jnp.stack([grid_x, grid_y], axis=-1)[None, :, :, None, :]

    s = xyscale[scale_idx]
    xy = (jax.nn.sigmoid(txy) * s - 0.5 * (s - 1) + grid) * strides[scale_idx]
    anchor = jnp.asarray(anchors[scale_idx]) * (input_size / 416.0)
    wh = jnp.exp(jnp.clip(twh, -20.0, 8.0)) * anchor
    out = jnp.concatenate([xy, wh, conf, probs], axis=-1)
    return out.reshape(n, gh * gw * 3, -1)


def box_iou_xywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix for center-format boxes: a [n,4], b [m,4] -> [n,m]."""
    a_min = a[:, None, :2] - a[:, None, 2:4] / 2
    a_max = a[:, None, :2] + a[:, None, 2:4] / 2
    b_min = b[None, :, :2] - b[None, :, 2:4] / 2
    b_max = b[None, :, :2] + b[None, :, 2:4] / 2
    inter = jnp.prod(jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min),
                              0.0, None), axis=-1)
    area_a = jnp.prod(a[:, None, 2:4], axis=-1)
    area_b = jnp.prod(b[None, :, 2:4], axis=-1)
    return inter / (area_a + area_b - inter + 1e-9)


def box_nms(boxes_xywh: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
            iou_threshold: float, max_output: int) -> jnp.ndarray:
    """Greedy IoU NMS over fixed-shape candidates; returns a keep mask."""
    iou = box_iou_xywh(boxes_xywh, boxes_xywh)
    return greedy_nms(iou, scores, valid, iou_threshold, max_output)


@dataclasses.dataclass
class PersonDetector:
    """Batched person detection with the reference's preprocessing contract.

    Preprocessing matches `metrabs_pytorch/multiperson/person_detector.py:
    14-33`: gamma-correct (linear-light) resize of the longer side to
    input_size, re-encode, pad to a multiple of 32 with gray (0.5).
    `detect_batched` returns padded (boxes5 [B, max_det, 5], valid [B,
    max_det]) in original image pixels — the interface PoseEstimator expects.
    """

    model: YOLOv4
    variables: dict
    input_size: int = 416
    top_candidates: int = 256
    # Opt-in candidate selection via jax.lax.approx_max_k (TPU
    # PartialReduce, much faster than exact O(n*k) top_k over the ~30k
    # anchors; profile: the sort bucket was ~8 ms/batch of the fused sparse
    # floor). Recall 0.99 only drops near-tied low scorers ahead of
    # thresholding + NMS, but the reference uses exact top-k
    # (`multiperson_model.py:236-238` topk_indices_ragged), so exact
    # lax.top_k is the parity DEFAULT until trained weights can quantify
    # the recall impact; flip on for serving-throughput mode.
    approx_top_k: bool = False

    def __post_init__(self):
        self._jitted = {}

    def _forward(self, variables, images_resized: jnp.ndarray) -> jnp.ndarray:
        heads = self.model.apply(variables, images_resized, train=False)
        anchors, strides, xyscale = self.model.decode_tables()
        decoded = [
            decode_head(h, i, self.input_size, anchors, strides, xyscale)
            for i, h in enumerate(heads)]
        return jnp.concatenate(decoded, axis=1)  # [N, n_anchors, 5+C]

    def _person_preds(self, variables, images_resized: jnp.ndarray):
        """(center-format boxes [N, A, 4] in resized px, person scores
        [N, A]) — the decode contract shared by the YOLOv4 (objectness x
        class prob) and YOLOv8 (anchor-free sigmoid class prob) families."""
        from metrabs_tpu.detect import yolov8 as yolov8_mod
        if isinstance(self.model, yolov8_mod.YOLOv8):
            heads = self.model.apply(variables, images_resized, train=False)
            merged = yolov8_mod.decode_heads(heads)
            return merged[..., :4], merged[..., 4 + PERSON_CLASS]
        preds = self._forward(variables, images_resized)
        return preds[..., :4], preds[..., 4] * preds[..., 5 + PERSON_CLASS]

    def _detect_core(self, variables, images, threshold, nms_iou_threshold, *,
                     max_detections: int, flip_aug: bool, flip_vertical: bool,
                     orig_h: int, orig_w: int):
        n = images.shape[0]
        size = self.input_size
        max_side = max(orig_h, orig_w)
        factor = size / max_side
        target_h = int(factor * orig_h)
        target_w = int(factor * orig_w)

        # Gamma-correct resize (`person_detector.py:21-24`). Measured note:
        # XLA fuses the gamma decode into the antialiased resize convolution;
        # a box-filter-pyramid "optimization" of this step benchmarked 34%
        # SLOWER (extra full-res materializations on the NHWC layout).
        # The resize runs in the net's compute dtype: with bf16 the full-res
        # linear-light tensor halves its HBM footprint, and bf16's 8-bit
        # mantissa matches the u8 source quantization (accumulation over the
        # ~20-tap antialias kernel adds <1% pixel error, below detector
        # sensitivity).
        comp_dtype = jnp.dtype(getattr(self.model, 'dtype', jnp.float32))
        lin = (images.astype(comp_dtype) / jnp.asarray(255.0, comp_dtype)) ** 2.2
        lin = jax.image.resize(
            lin, (n, target_h, target_w, 3), method='linear', antialias=factor < 1)
        resized = lin ** (1 / 2.2)
        pad_h = -target_h % 32
        pad_w = -target_w % 32
        hp, wp = pad_h // 2, pad_w // 2
        resized = jnp.pad(
            resized, ((0, 0), (hp, pad_h - hp), (wp, pad_w - wp), (0, 0)),
            constant_values=0.5)

        boxes, scores = self._person_preds(variables, resized)
        if flip_aug:
            fboxes, fscores = self._person_preds(variables, resized[:, :, ::-1])
            fw = resized.shape[2]
            fboxes = fboxes.at[..., 0].set(fw - fboxes[..., 0])
            boxes = jnp.concatenate([boxes, fboxes], axis=1)
            scores = jnp.concatenate([scores, fscores], axis=1)
            if flip_vertical:
                vboxes, vscores = self._person_preds(variables, resized[:, ::-1])
                fh = resized.shape[1]
                vboxes = vboxes.at[..., 1].set(fh - vboxes[..., 1])
                boxes = jnp.concatenate([boxes, vboxes], axis=1)
                scores = jnp.concatenate([scores, vscores], axis=1)

        # Per-image: top candidates by score, then NMS, then top max_detections.
        k = min(self.top_candidates, scores.shape[1])
        if self.approx_top_k and scores.shape[1] > k:
            top_scores, top_idx = jax.lax.approx_max_k(
                scores, k, recall_target=0.99)
        else:
            top_scores, top_idx = jax.lax.top_k(scores, k)
        top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)

        def per_image(b, s):
            valid = s >= threshold
            keep = box_nms(b, s, valid, nms_iou_threshold, max_detections)
            score_masked = jnp.where(keep, s, -jnp.inf)
            sel_scores, sel = jax.lax.top_k(score_masked, max_detections)
            sel_boxes = b[sel]
            ok = jnp.isfinite(sel_scores)
            # center-format -> (x, y, w, h) top-left format, unpad + unscale.
            # Per-axis factors (`person_detector.py:39-40`): target_h/w are
            # truncated ints, so the resized content spans orig/target pixels
            # per axis — a single 1/factor skews the short axis by up to
            # ~max_side/input_size px at the far edge.
            x_factor = orig_w / target_w
            y_factor = orig_h / target_h
            x = (sel_boxes[:, 0] - sel_boxes[:, 2] / 2 - wp) * x_factor
            y = (sel_boxes[:, 1] - sel_boxes[:, 3] / 2 - hp) * y_factor
            w = sel_boxes[:, 2] * x_factor
            h = sel_boxes[:, 3] * y_factor
            out = jnp.stack([x, y, w, h, jnp.where(ok, sel_scores, 0.0)], axis=1)
            return jnp.where(ok[:, None], out, 0.0), ok

        return jax.vmap(per_image)(top_boxes, top_scores)

    def detect_batched(self, images, threshold=0.3, nms_iou_threshold=0.7,
                       max_detections=16, flip_aug=False, flip_vertical=False):
        images = jnp.asarray(images)
        orig_h, orig_w = int(images.shape[1]), int(images.shape[2])
        key = (max_detections, flip_aug, flip_vertical, orig_h, orig_w)
        if key not in self._jitted:
            import functools
            self._jitted[key] = jax.jit(functools.partial(
                self._detect_core, max_detections=int(max_detections),
                flip_aug=bool(flip_aug), flip_vertical=bool(flip_vertical),
                orig_h=orig_h, orig_w=orig_w))
        # Weights are a jit argument, not a closure (HLO constant-embedding
        # breaks remote compilation for large models).
        return self._jitted[key](
            self.variables, images, jnp.float32(threshold),
            jnp.float32(nms_iou_threshold))


def yolo_flat_to_scanned(flat_variables: dict, scanned_template: dict) -> dict:
    """Restructures flat-layout YOLOv4 variables (darknet import target) into
    the scan_repeats layout: each `res_scan_<start>_<n>` group stacks
    conv_{start+2k} -> conv_a and conv_{start+2k+1} -> conv_b. Shares the
    walk/stack/validate kernel with the backbone converter."""
    from metrabs_tpu.io.scan_convert import stack_scan_groups

    def source_key(collection, start, i, rest):
        offset = {'conv_a': 0, 'conv_b': 1}[rest[0]]
        return (collection, f'conv_{start + 2 * i + offset}') + rest[1:]

    return stack_scan_groups(flat_variables, scanned_template,
                             r'res_scan_(\d+)_(\d+)$', source_key)


def load_darknet_weights(model: YOLOv4, variables: dict, path: str) -> dict:
    """Imports the original `yolov4.weights` release file.

    `model`/`variables` must use scan_repeats=False (the flat conv_{i}
    layout); convert for a scanned model with `yolo_flat_to_scanned`.

    darknet layout: 5 int32 header, then per conv section in cfg order:
    [bn: beta, gamma, mean, var][conv: OIHW] or [bias][conv: OIHW] for the
    three output convs. Our module names conv_<i> follow cfg order exactly,
    so the import is a linear scan. Returns updated variables.
    """
    import flax

    with open(path, 'rb') as f:
        np.fromfile(f, dtype=np.int32, count=5)  # header
        data = np.fromfile(f, dtype=np.float32)

    flat = flax.traverse_util.flatten_dict(variables)
    n_convs = 1 + max(
        int(k[1].split('_')[1]) for k in flat if k[1].startswith('conv_'))
    offset = 0

    def take(n):
        nonlocal offset
        out = data[offset:offset + n]
        offset += n
        return out

    new_flat = dict(flat)
    for i in range(n_convs):
        kernel_key = ('params', f'conv_{i}', 'conv', 'kernel')
        kernel = flat[kernel_key]
        kh, kw, cin, cout = kernel.shape
        has_bn = ('params', f'conv_{i}', 'bn', 'scale') in flat
        if has_bn:
            beta = take(cout)
            gamma = take(cout)
            mean = take(cout)
            var = take(cout)
            new_flat[('params', f'conv_{i}', 'bn', 'bias')] = jnp.asarray(beta)
            new_flat[('params', f'conv_{i}', 'bn', 'scale')] = jnp.asarray(gamma)
            new_flat[('batch_stats', f'conv_{i}', 'bn', 'mean')] = jnp.asarray(mean)
            new_flat[('batch_stats', f'conv_{i}', 'bn', 'var')] = jnp.asarray(var)
        else:
            bias = take(cout)
            new_flat[('params', f'conv_{i}', 'conv', 'bias')] = jnp.asarray(bias)
        w = take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
        new_flat[kernel_key] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    if offset != len(data):
        raise ValueError(
            f'Weight file size mismatch: consumed {offset} of {len(data)} floats')
    return flax.traverse_util.unflatten_dict(new_flat)
