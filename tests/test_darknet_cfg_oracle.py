"""Independent darknet-cfg oracle for the YOLOv4-tiny detector.

The reference consumes its detector as an opaque external SavedModel
(`metrabs_tf/multiperson/save_model.py:29`, `docs/TRAINING.md:64`), so there
is no importable reference code to execute as a golden oracle and the real
`yolov4-tiny.weights` release cannot enter this egress-blocked environment.
This module closes the gap with an INDEPENDENT implementation of the darknet
format itself:

  * a pure-numpy interpreter of darknet cfg sections (convolutional / route
    incl. the groups=2 CSP split / maxpool / upsample / yolo), executing the
    canonical public yolov4-tiny.cfg layer list transcribed below;
  * the interpreter reads a darknet-format binary weight file by the
    documented layout (5 int32 header, then per conv section
    [bn: beta, gamma, mean, var | bias] + OIHW kernel) with its OWN cursor
    walk — shared bookkeeping with `load_darknet_weights` is zero.

A randomly-weighted file is written once; `YOLOv4Tiny` +
`load_darknet_weights` must reproduce the interpreter's two yolo-head inputs
exactly (up to conv-accumulation noise). This pins, end to end and against a
from-scratch second implementation: the cfg->module layer ordering, the CSP
route -1(groups)/-1,-2/-6,-1 topology, the head route -4 split, OIHW->HWIO
kernel transposition, darknet top-left stride-2 padding, and the
per-section weight-file order.

BN note: the interpreter applies the inference BN formula
gamma*(x-mean)/sqrt(var+eps) + beta with eps=1e-5 (the convention of the
TF fork the reference actually loads; darknet-proper uses
(x-mean)/(sqrt(var)+1e-6), a <1e-5 relative difference at O(1) variances —
far below the asserted tolerance).
"""

import io
import os

import numpy as np
import pytest

# The canonical public yolov4-tiny.cfg topology (transcribed DATA, one tuple
# per section in file order; layer indices follow darknet's counting where
# every section is a layer). conv: (filters, size, stride, bn, activation).
YOLOV4_TINY_CFG = [
    ('conv', 32, 3, 2, True, 'leaky'),    # 0
    ('conv', 64, 3, 2, True, 'leaky'),    # 1
    ('conv', 64, 3, 1, True, 'leaky'),    # 2
    ('route', [-1], 2, 1),                # 3   second channel half of 2
    ('conv', 32, 3, 1, True, 'leaky'),    # 4
    ('conv', 32, 3, 1, True, 'leaky'),    # 5
    ('route', [-1, -2], 1, 0),            # 6   concat(5, 4)
    ('conv', 64, 1, 1, True, 'leaky'),    # 7
    ('route', [-6, -1], 1, 0),            # 8   concat(2, 7)
    ('maxpool', 2, 2),                    # 9
    ('conv', 128, 3, 1, True, 'leaky'),   # 10
    ('route', [-1], 2, 1),                # 11
    ('conv', 64, 3, 1, True, 'leaky'),    # 12
    ('conv', 64, 3, 1, True, 'leaky'),    # 13
    ('route', [-1, -2], 1, 0),            # 14
    ('conv', 128, 1, 1, True, 'leaky'),   # 15
    ('route', [-6, -1], 1, 0),            # 16
    ('maxpool', 2, 2),                    # 17
    ('conv', 256, 3, 1, True, 'leaky'),   # 18
    ('route', [-1], 2, 1),                # 19
    ('conv', 128, 3, 1, True, 'leaky'),   # 20
    ('conv', 128, 3, 1, True, 'leaky'),   # 21
    ('route', [-1, -2], 1, 0),            # 22
    ('conv', 256, 1, 1, True, 'leaky'),   # 23
    ('route', [-6, -1], 1, 0),            # 24
    ('maxpool', 2, 2),                    # 25
    ('conv', 512, 3, 1, True, 'leaky'),   # 26
    ('conv', 256, 1, 1, True, 'leaky'),   # 27
    ('conv', 512, 3, 1, True, 'leaky'),   # 28
    ('conv', 255, 1, 1, False, 'linear'),  # 29
    ('yolo',),                            # 30  stride-32 head (lbbox)
    ('route', [-4], 1, 0),                # 31  layer 27
    ('conv', 128, 1, 1, True, 'leaky'),   # 32
    ('upsample', 2),                      # 33
    ('route', [-1, 23], 1, 0),            # 34  concat(33, 23)
    ('conv', 256, 3, 1, True, 'leaky'),   # 35
    ('conv', 255, 1, 1, False, 'linear'),  # 36
    ('yolo',),                            # 37  stride-16 head (mbbox)
]


def _conv2d_nhwc(x, kernel_oihw, stride):
    """Plain im2col conv, darknet padding: pad=size//2 both sides, output
    (w + 2p - k)//s + 1 (for stride 2 this reproduces darknet's effective
    top-left-biased window set)."""
    cout, cin, kh, kw = kernel_oihw.shape
    p = kh // 2
    x = np.pad(x, ((p, p), (p, p), (0, 0)))
    h, w, _ = x.shape
    oh = (h - kh) // stride + 1
    ow = (w - kw) // stride + 1
    cols = np.empty((oh, ow, kh * kw * cin), np.float32)
    for dy in range(kh):
        for dx in range(kw):
            patch = x[dy:dy + stride * oh:stride, dx:dx + stride * ow:stride]
            cols[:, :, (dy * kw + dx) * cin:(dy * kw + dx + 1) * cin] = patch
    wmat = kernel_oihw.transpose(2, 3, 1, 0).reshape(kh * kw * cin, cout)
    return cols.reshape(oh * ow, -1) @ wmat, (oh, ow, cout)


class DarknetInterpreter:
    """Executes a cfg section list against a darknet weight file, one image
    at a time (HWC float32). Fully independent of the flax module."""

    def __init__(self, cfg, weight_bytes, in_channels=3, bn_eps=1e-5):
        self.cfg = cfg
        self.bn_eps = bn_eps
        buf = io.BytesIO(weight_bytes)
        np.frombuffer(buf.read(20), np.int32)  # 5 int32 header
        data = np.frombuffer(buf.read(), np.float32)
        self.params = []
        cursor = 0

        def take(n):
            nonlocal cursor
            out = data[cursor:cursor + n]
            cursor += n
            return out

        channels = in_channels
        per_layer_channels = []
        for sec in cfg:
            if sec[0] == 'conv':
                _, filters, size, _, bn, _ = sec
                if bn:
                    stats = dict(beta=take(filters).copy(),
                                 gamma=take(filters).copy(),
                                 mean=take(filters).copy(),
                                 var=take(filters).copy())
                else:
                    stats = dict(bias=take(filters).copy())
                kernel = take(filters * channels * size * size).reshape(
                    filters, channels, size, size).copy()
                self.params.append((stats, kernel))
                channels = filters
            else:
                self.params.append(None)
                if sec[0] == 'route':
                    _, layers, groups, _ = sec
                    idx = [i if i >= 0 else len(per_layer_channels) + i
                           for i in layers]
                    channels = sum(per_layer_channels[i] for i in idx) // groups
                # maxpool/upsample/yolo keep the channel count
            per_layer_channels.append(channels)
        if cursor != len(data):
            raise ValueError(f'consumed {cursor} of {len(data)} floats')

    def __call__(self, image_hwc):
        outs = []
        yolo_inputs = []
        x = np.asarray(image_hwc, np.float32)
        for li, sec in enumerate(self.cfg):
            kind = sec[0]
            if kind == 'conv':
                _, filters, size, stride, bn, act = sec
                stats, kernel = self.params[li]
                y, shape = _conv2d_nhwc(x, kernel, stride)
                if bn:
                    inv = stats['gamma'] / np.sqrt(stats['var'] + self.bn_eps)
                    y = (y - stats['mean']) * inv + stats['beta']
                else:
                    y = y + stats['bias']
                if act == 'leaky':
                    y = np.where(y > 0, y, 0.1 * y)
                x = y.reshape(shape)
            elif kind == 'route':
                _, layers, groups, group_id = sec
                idx = [i if i >= 0 else li + i for i in layers]
                parts = [outs[i] for i in idx]
                x = np.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
                if groups > 1:
                    g = x.shape[-1] // groups
                    x = x[..., group_id * g:(group_id + 1) * g]
            elif kind == 'maxpool':
                _, size, stride = sec
                h, w, c = x.shape
                x = x.reshape(h // size, size, w // size, size, c).max((1, 3))
            elif kind == 'upsample':
                _, stride = sec
                x = np.repeat(np.repeat(x, stride, 0), stride, 1)
            elif kind == 'yolo':
                yolo_inputs.append(outs[li - 1])
                x = outs[li - 1]
            outs.append(x)
        return yolo_inputs  # [stride-32 (lbbox), stride-16 (mbbox)]


def _make_weight_bytes(cfg, in_channels=3, seed=0):
    """Random darknet-format weight bytes for the cfg (kernels fan-in
    scaled, BN stats near identity, so 21 stacked convs stay O(1))."""
    rng = np.random.default_rng(seed)
    chunks = [np.array([0, 2, 5, 0, 0], np.int32).tobytes()]
    channels = in_channels
    layer_channels = []
    for sec in cfg:
        if sec[0] == 'conv':
            _, filters, size, _, bn, _ = sec
            if bn:
                chunks.append(  # beta, gamma, mean, var
                    rng.normal(0, 0.2, filters).astype(np.float32).tobytes())
                chunks.append(
                    rng.uniform(0.8, 1.2, filters).astype(np.float32).tobytes())
                chunks.append(
                    rng.normal(0, 0.3, filters).astype(np.float32).tobytes())
                chunks.append(
                    rng.uniform(0.5, 1.5, filters).astype(np.float32).tobytes())
            else:
                chunks.append(
                    rng.normal(0, 0.2, filters).astype(np.float32).tobytes())
            fan_in = channels * size * size
            kernel = rng.normal(0, fan_in ** -0.5,
                                (filters, channels, size, size))
            chunks.append(kernel.astype(np.float32).tobytes())
            channels = filters
        elif sec[0] == 'route':
            _, layers, groups, _ = sec
            idx = [i if i >= 0 else len(layer_channels) + i for i in layers]
            channels = sum(layer_channels[i] for i in idx) // groups
        layer_channels.append(channels)
    return b''.join(chunks)


@pytest.fixture(scope='module')
def tiny_weight_file(tmp_path_factory):
    data = _make_weight_bytes(YOLOV4_TINY_CFG)
    path = tmp_path_factory.mktemp('darknet') / 'yolov4-tiny.weights'
    path.write_bytes(data)
    return str(path), data


def test_yolov4_tiny_matches_independent_darknet_interpreter(tiny_weight_file):
    """Full-net numeric anchor: flax YOLOv4Tiny + load_darknet_weights vs the
    from-scratch numpy cfg interpreter on the same weight file."""
    import jax
    import jax.numpy as jnp

    from metrabs_tpu.detect.yolov4 import YOLOv4Tiny, load_darknet_weights

    path, data = tiny_weight_file
    interp = DarknetInterpreter(YOLOV4_TINY_CFG, data)

    rng = np.random.default_rng(3)
    image = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    want_lbbox, want_mbbox = interp(image)

    model = YOLOv4Tiny(dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    variables = load_darknet_weights(model, variables, path)
    mbbox, lbbox = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, image[None])

    np.testing.assert_allclose(
        np.asarray(lbbox)[0], want_lbbox, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(mbbox)[0], want_mbbox, rtol=2e-4, atol=2e-4)


def test_weight_file_is_fully_consumed(tiny_weight_file):
    """Both readers must agree the file has zero trailing floats — a
    mis-sized section anywhere would desynchronize every later layer."""
    import jax
    import jax.numpy as jnp

    from metrabs_tpu.detect.yolov4 import YOLOv4Tiny, load_darknet_weights

    path, data = tiny_weight_file
    # Truncated file: both readers must reject it.
    bad_path = path + '.trunc'
    with open(bad_path, 'wb') as f:
        f.write(data[:-8])
    with pytest.raises(ValueError):
        DarknetInterpreter(YOLOV4_TINY_CFG, data + b'\x00' * 4)

    model = YOLOv4Tiny(dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError):
        load_darknet_weights(model, variables, bad_path)


def test_decode_head_grid_corner_equations():
    """Property-tests `decode_head` against the documented sigmoid/xyscale
    equations (the tflite-fork decode the reference serves through,
    `save_model.py:29`): at a grid corner cell with logit 0 the center sits
    at (grid + 0.5*s - 0.5*(s-1)) * stride, and wh = exp(t) * anchor scaled
    by input_size/416."""
    import numpy as np

    from metrabs_tpu.detect.yolov4 import (
        ANCHORS_TINY, STRIDES_TINY, XYSCALE_TINY, decode_head)

    input_size = 160
    for scale_idx, stride in enumerate(STRIDES_TINY):
        g = input_size // stride
        raw = np.zeros((1, g, g, 3 * 85), np.float32)
        raw_r = raw.reshape(1, g, g, 3, 85)
        raw_r[0, 0, 0, 0, 2:4] = np.log(2.0)  # wh logits at the corner
        out = np.asarray(
            decode_head(raw, scale_idx, input_size,
                        anchors=ANCHORS_TINY, strides=STRIDES_TINY,
                        xyscale=XYSCALE_TINY)).reshape(g, g, 3, 85)

        s = XYSCALE_TINY[scale_idx]
        center0 = (0.5 * s - 0.5 * (s - 1)) * stride
        # every cell, anchor 1: zero logits -> center at cell + 0.5 (scaled)
        cols = np.arange(g, dtype=np.float64) * stride + center0
        np.testing.assert_allclose(
            out[..., 1, 0], np.broadcast_to(cols[None, :], (g, g)), rtol=1e-5)
        np.testing.assert_allclose(
            out[..., 1, 1], np.broadcast_to(cols[:, None], (g, g)), rtol=1e-5)
        # corner cell anchor 0: wh = 2 * anchor * (input/416)
        np.testing.assert_allclose(
            out[0, 0, 0, 2:4],
            2.0 * ANCHORS_TINY[scale_idx, 0] * (input_size / 416.0), rtol=1e-5)
        # objectness/class at logit 0 -> 0.5
        np.testing.assert_allclose(out[..., 4:], 0.5, atol=1e-6)


def test_decode_head_wh_clamp_saturates_not_inf():
    """Extreme wh logits must clamp (exp(+-inf) would poison NMS)."""
    import numpy as np

    from metrabs_tpu.detect.yolov4 import (
        ANCHORS_TINY, STRIDES_TINY, XYSCALE_TINY, decode_head)

    g = 160 // STRIDES_TINY[0]
    raw = np.zeros((1, g, g, 3 * 85), np.float32)
    raw.reshape(1, g, g, 3, 85)[..., 2:4] = 1e9
    out = np.asarray(decode_head(raw, 0, 160, anchors=ANCHORS_TINY,
                                 strides=STRIDES_TINY, xyscale=XYSCALE_TINY))
    assert np.all(np.isfinite(out))
