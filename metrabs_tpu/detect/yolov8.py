"""YOLOv8 person detector in flax (anchor-free, C2f/SPPF/DFL).

The reference's PyTorch stack detects people with ultralytics YOLOv8-m
(`metrabs_pytorch/multiperson/person_detector.py:12`); this is a first-party
TPU-native implementation of that architecture (the public yolov8.yaml
layout: CSP backbone with C2f blocks, SPPF, PAN neck, decoupled
box/class heads with distribution-focal-loss box regression), plus an
importer for ultralytics-layout state_dicts so released yolov8{n,s,m,l,x}.pt
weights load directly.

Module names mirror the ultralytics graph (l0..l22 with cv1/cv2/m{i}
children) so the weight mapping is mechanical. All convs are NHWC/bf16-
friendly 1x1/3x3 SAME convs that map straight onto the MXU; the three-level
decode is batched arithmetic (no anchors — cell centers + DFL expectations).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

REG_MAX = 16
STRIDES = (8, 16, 32)

# depth multiple, width multiple, max channels (ultralytics yolov8 scales).
SCALES = {
    'n': (1 / 3, 0.25, 1024),
    's': (1 / 3, 0.50, 1024),
    'm': (2 / 3, 0.75, 768),
    'l': (1.0, 1.0, 512),
    'x': (1.0, 1.25, 512),
}


def _make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


def _chan(base: int, width: float, max_channels: int) -> int:
    return _make_divisible(min(base, max_channels) * width)


def _depth(n: int, depth: float) -> int:
    return max(round(n * depth), 1)


class ConvBnSilu(nn.Module):
    """Conv(k, s, SAME, no bias) + BN + SiLU — ultralytics' Conv block."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding='SAME',
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name='bn')(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """Two 3x3 convs with optional residual (ultralytics Bottleneck with
    k=(3,3), e=1.0 as used inside C2f)."""

    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBnSilu(self.features, 3, dtype=self.dtype, name='cv1')(
            x, train)
        h = ConvBnSilu(self.features, 3, dtype=self.dtype, name='cv2')(
            h, train)
        return x + h if self.shortcut else h


class C2f(nn.Module):
    """Cross-stage partial block: split, chain n bottlenecks on one half,
    concat everything, fuse with a 1x1."""

    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBnSilu(2 * c, 1, dtype=self.dtype, name='cv1')(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        h = y2
        for i in range(self.n):
            h = Bottleneck(c, shortcut=self.shortcut, dtype=self.dtype,
                           name=f'm{i}')(h, train)
            outs.append(h)
        return ConvBnSilu(self.features, 1, dtype=self.dtype, name='cv2')(
            jnp.concatenate(outs, axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three chained 5x5 maxpools."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        h = ConvBnSilu(c, 1, dtype=self.dtype, name='cv1')(x, train)
        p1 = nn.max_pool(h, (5, 5), strides=(1, 1), padding='SAME')
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding='SAME')
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding='SAME')
        return ConvBnSilu(self.features, 1, dtype=self.dtype, name='cv2')(
            jnp.concatenate([h, p1, p2, p3], axis=-1), train)


class DetectHead(nn.Module):
    """Per-level decoupled heads: cv2 -> 4*REG_MAX box-bin logits, cv3 ->
    nc class logits (ultralytics Detect)."""

    num_classes: int
    level_channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2 = max(16, self.level_channels[0] // 4, REG_MAX * 4)
        c3 = max(self.level_channels[0], min(self.num_classes, 100))
        outs = []
        for i, f in enumerate(feats):
            b = ConvBnSilu(c2, 3, dtype=self.dtype, name=f'cv2_{i}_0')(f, train)
            b = ConvBnSilu(c2, 3, dtype=self.dtype, name=f'cv2_{i}_1')(b, train)
            b = nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f'cv2_{i}_2')(b)
            c = ConvBnSilu(c3, 3, dtype=self.dtype, name=f'cv3_{i}_0')(f, train)
            c = ConvBnSilu(c3, 3, dtype=self.dtype, name=f'cv3_{i}_1')(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f'cv3_{i}_2')(c)
            outs.append((b, c))
        return outs


class YOLOv8(nn.Module):
    """Full detector: returns per-level (box_bin_logits, class_logits).

    `size` in {'n','s','m','l','x'}. Input [N, H, W, 3] in [0, 1] (the
    gamma-re-encoded space the reference feeds ultralytics,
    `person_detector.py:21-33`); H, W multiples of 32.
    """

    size: str = 'm'
    num_classes: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, w, mc = SCALES[self.size]
        ch = lambda base: _chan(base, w, mc)
        dt = self.dtype
        x = x.astype(dt)

        # Backbone (yolov8.yaml indices).
        x = ConvBnSilu(ch(64), 3, 2, dt, name='l0')(x, train)
        x = ConvBnSilu(ch(128), 3, 2, dt, name='l1')(x, train)
        x = C2f(ch(128), _depth(3, d), True, dt, name='l2')(x, train)
        x = ConvBnSilu(ch(256), 3, 2, dt, name='l3')(x, train)
        p3 = C2f(ch(256), _depth(6, d), True, dt, name='l4')(x, train)
        x = ConvBnSilu(ch(512), 3, 2, dt, name='l5')(p3, train)
        p4 = C2f(ch(512), _depth(6, d), True, dt, name='l6')(x, train)
        x = ConvBnSilu(ch(1024), 3, 2, dt, name='l7')(p4, train)
        x = C2f(ch(1024), _depth(3, d), True, dt, name='l8')(x, train)
        p5 = SPPF(ch(1024), dt, name='l9')(x, train)

        # PAN neck.
        up = lambda t: jax.image.resize(
            t, (t.shape[0], t.shape[1] * 2, t.shape[2] * 2, t.shape[3]),
            method='nearest')
        h = jnp.concatenate([up(p5), p4], axis=-1)
        n4 = C2f(ch(512), _depth(3, d), False, dt, name='l12')(h, train)
        h = jnp.concatenate([up(n4), p3], axis=-1)
        out3 = C2f(ch(256), _depth(3, d), False, dt, name='l15')(h, train)
        h = ConvBnSilu(ch(256), 3, 2, dt, name='l16')(out3, train)
        n4b = C2f(ch(512), _depth(3, d), False, dt, name='l18')(
            jnp.concatenate([h, n4], axis=-1), train)
        h = ConvBnSilu(ch(512), 3, 2, dt, name='l19')(n4b, train)
        out5 = C2f(ch(1024), _depth(3, d), False, dt, name='l21')(
            jnp.concatenate([h, p5], axis=-1), train)

        return DetectHead(
            self.num_classes, (ch(256), ch(512), ch(1024)), dt,
            name='l22')([out3, n4b, out5], train)


def decode_heads(level_outputs) -> jnp.ndarray:
    """Per-level (box_bins, cls_logits) -> [N, total_anchors, 4 + nc]:
    center-format boxes in input pixels + sigmoid class probabilities.

    DFL decode: softmax over the REG_MAX bins per side, expectation =
    left/top/right/bottom distance from the cell center (in cells),
    scaled by the level stride."""
    outs = []
    for (box_bins, cls_logits), stride in zip(level_outputs, STRIDES):
        n, gh, gw, _ = box_bins.shape
        bins = box_bins.astype(jnp.float32).reshape(n, gh, gw, 4, REG_MAX)
        dist = jnp.sum(jax.nn.softmax(bins, axis=-1)
                       * jnp.arange(REG_MAX, dtype=jnp.float32), axis=-1)
        cx = (jnp.arange(gw, dtype=jnp.float32) + 0.5)[None, None, :]
        cy = (jnp.arange(gh, dtype=jnp.float32) + 0.5)[None, :, None]
        x1 = cx - dist[..., 0]
        y1 = cy - dist[..., 1]
        x2 = cx + dist[..., 2]
        y2 = cy + dist[..., 3]
        boxes = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2,
                           x2 - x1, y2 - y1], axis=-1) * stride
        probs = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        merged = jnp.concatenate([boxes, probs], axis=-1)
        outs.append(merged.reshape(n, gh * gw, -1))
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# Ultralytics state_dict import


def _flax_module_names(size: str, num_classes: int) -> Dict[str, Any]:
    """Walks a dummy init to enumerate the parameter tree paths."""
    model = YOLOv8(size=size, num_classes=num_classes)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32)))
    return model, variables


def import_yolov8_from_torch(state_dict: Dict[str, Any],
                             flax_variables: Dict) -> Dict:
    """Fills a flax YOLOv8 variable tree from an ultralytics DetectionModel
    state_dict (keys `model.<idx>.<sub>.conv.weight` etc.). Returns updated
    variables. Unknown torch keys raise; missing expected keys raise — the
    import is all-or-nothing.

    Layout notes (checked against the public ultralytics module graph):
     - Conv block: `conv.weight` [O,I,H,W] -> HWIO; `bn.{weight,bias,
       running_mean,running_var}` -> BN scale/bias/mean/var.
     - C2f: `cv1`, `cv2`, bottlenecks `m.<i>.cv1/cv2`.
     - Detect (idx 22): `cv2.<lvl>.<0|1>` Conv blocks + `cv2.<lvl>.2`
       plain Conv2d (weight+bias); same for cv3; `dfl.conv.weight` is the
       CONSTANT arange(REG_MAX) expectation kernel — not a parameter here
       (decode_heads computes the expectation directly), so it is ignored.
    """
    import copy

    variables = jax.tree_util.tree_map(np.asarray, flax_variables)
    variables = copy.deepcopy(variables)
    params = variables['params']
    stats = variables['batch_stats']
    consumed = set()

    def get(key):
        if key not in state_dict:
            raise KeyError(f'ultralytics state_dict missing {key!r}')
        consumed.add(key)
        return np.asarray(state_dict[key])

    def assign(node, leaf_key, value, src_key):
        old = node[leaf_key]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(
                f'shape mismatch importing {src_key!r}: checkpoint '
                f'{value.shape} vs model {old.shape} — wrong size variant?')
        node[leaf_key] = value

    def put_convbn(flax_parent_p, flax_parent_s, torch_prefix):
        assign(flax_parent_p['conv'], 'kernel', np.transpose(
            get(f'{torch_prefix}.conv.weight'), (2, 3, 1, 0)),
            f'{torch_prefix}.conv.weight')
        assign(flax_parent_p['bn'], 'scale', get(f'{torch_prefix}.bn.weight'),
               f'{torch_prefix}.bn.weight')
        assign(flax_parent_p['bn'], 'bias', get(f'{torch_prefix}.bn.bias'),
               f'{torch_prefix}.bn.bias')
        assign(flax_parent_s['bn'], 'mean',
               get(f'{torch_prefix}.bn.running_mean'),
               f'{torch_prefix}.bn.running_mean')
        assign(flax_parent_s['bn'], 'var',
               get(f'{torch_prefix}.bn.running_var'),
               f'{torch_prefix}.bn.running_var')

    def put_c2f(name_p, name_s, torch_prefix):
        put_convbn(name_p['cv1'], name_s['cv1'], f'{torch_prefix}.cv1')
        put_convbn(name_p['cv2'], name_s['cv2'], f'{torch_prefix}.cv2')
        i = 0
        while f'm{i}' in name_p:
            for cv in ('cv1', 'cv2'):
                put_convbn(name_p[f'm{i}'][cv], name_s[f'm{i}'][cv],
                           f'{torch_prefix}.m.{i}.{cv}')
            i += 1

    conv_idxs = [0, 1, 3, 5, 7, 16, 19]
    c2f_idxs = [2, 4, 6, 8, 12, 15, 18, 21]
    for i in conv_idxs:
        put_convbn(params[f'l{i}'], stats[f'l{i}'], f'model.{i}')
    for i in c2f_idxs:
        put_c2f(params[f'l{i}'], stats[f'l{i}'], f'model.{i}')
    for cv in ('cv1', 'cv2'):
        put_convbn(params['l9'][cv], stats['l9'][cv], f'model.9.{cv}')

    det_p, det_s = params['l22'], stats['l22']
    for branch in ('cv2', 'cv3'):
        for lvl in range(3):
            for j in (0, 1):
                put_convbn(det_p[f'{branch}_{lvl}_{j}'],
                           det_s[f'{branch}_{lvl}_{j}'],
                           f'model.22.{branch}.{lvl}.{j}')
            final = det_p[f'{branch}_{lvl}_2']
            assign(final, 'kernel', np.transpose(
                get(f'model.22.{branch}.{lvl}.2.weight'), (2, 3, 1, 0)),
                f'model.22.{branch}.{lvl}.2.weight')
            assign(final, 'bias', get(f'model.22.{branch}.{lvl}.2.bias'),
                   f'model.22.{branch}.{lvl}.2.bias')

    # The DFL expectation kernel is a buffer, not a learnable parameter.
    consumed.add('model.22.dfl.conv.weight')
    leftovers = {k for k in state_dict
                 if k not in consumed and 'num_batches_tracked' not in k}
    if leftovers:
        raise KeyError(
            f'{len(leftovers)} unconsumed ultralytics keys, e.g. '
            f'{sorted(leftovers)[:4]} — architecture/size mismatch?')
    return variables


def export_torch_style_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Inverse of `import_yolov8_from_torch` for round-trip testing: emits
    an ultralytics-layout state_dict from a flax variable tree."""
    out: Dict[str, np.ndarray] = {}
    params = variables['params']
    stats = variables['batch_stats']

    def dump_convbn(p, s, prefix):
        out[f'{prefix}.conv.weight'] = np.transpose(
            np.asarray(p['conv']['kernel']), (3, 2, 0, 1))
        out[f'{prefix}.bn.weight'] = np.asarray(p['bn']['scale'])
        out[f'{prefix}.bn.bias'] = np.asarray(p['bn']['bias'])
        out[f'{prefix}.bn.running_mean'] = np.asarray(s['bn']['mean'])
        out[f'{prefix}.bn.running_var'] = np.asarray(s['bn']['var'])

    def dump_c2f(p, s, prefix):
        dump_convbn(p['cv1'], s['cv1'], f'{prefix}.cv1')
        dump_convbn(p['cv2'], s['cv2'], f'{prefix}.cv2')
        i = 0
        while f'm{i}' in p:
            for cv in ('cv1', 'cv2'):
                dump_convbn(p[f'm{i}'][cv], s[f'm{i}'][cv],
                            f'{prefix}.m.{i}.{cv}')
            i += 1

    for i in [0, 1, 3, 5, 7, 16, 19]:
        dump_convbn(params[f'l{i}'], stats[f'l{i}'], f'model.{i}')
    for i in [2, 4, 6, 8, 12, 15, 18, 21]:
        dump_c2f(params[f'l{i}'], stats[f'l{i}'], f'model.{i}')
    for cv in ('cv1', 'cv2'):
        dump_convbn(params['l9'][cv], stats['l9'][cv], f'model.9.{cv}')
    for branch in ('cv2', 'cv3'):
        for lvl in range(3):
            for j in (0, 1):
                dump_convbn(params['l22'][f'{branch}_{lvl}_{j}'],
                            stats['l22'][f'{branch}_{lvl}_{j}'],
                            f'model.22.{branch}.{lvl}.{j}')
            p2 = params['l22'][f'{branch}_{lvl}_2']
            out[f'model.22.{branch}.{lvl}.2.weight'] = np.transpose(
                np.asarray(p2['kernel']), (3, 2, 0, 1))
            out[f'model.22.{branch}.{lvl}.2.bias'] = np.asarray(p2['bias'])
    out['model.22.dfl.conv.weight'] = np.arange(
        REG_MAX, dtype=np.float32).reshape(1, REG_MAX, 1, 1)
    return out
