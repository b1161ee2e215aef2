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
                elif act == 'mish':
                    # darknet mish: x * tanh(softplus(x)).
                    y = y * np.tanh(np.logaddexp(y, 0.0))
                x = y.reshape(shape)
            elif kind == 'route':
                _, layers, groups, group_id = sec
                idx = [i if i >= 0 else li + i for i in layers]
                parts = [outs[i] for i in idx]
                x = np.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
                if groups > 1:
                    g = x.shape[-1] // groups
                    x = x[..., group_id * g:(group_id + 1) * g]
            elif kind == 'shortcut':
                # darknet [shortcut] from=<offset>: add to the previous
                # layer's output (linear activation in yolov4.cfg).
                _, offset = sec
                x = outs[li - 1] + outs[li + offset]
            elif kind == 'maxpool':
                _, size, stride = sec
                h, w, c = x.shape
                if stride == size:
                    x = x.reshape(h // size, size, w // size, size,
                                  c).max((1, 3))
                else:
                    # SPP pools: stride 1, SAME output size; darknet pads
                    # size-1 total (size//2 each side for odd sizes) with
                    # -FLT_MAX (forward_maxpool_layer).
                    assert stride == 1, sec
                    p = size // 2
                    xp = np.full((h + 2 * p, w + 2 * p, c), -np.inf,
                                 np.float32)
                    xp[p:p + h, p:p + w] = x
                    y = np.full_like(x, -np.inf)
                    for dy in range(size):
                        for dx in range(size):
                            y = np.maximum(y, xp[dy:dy + h, dx:dx + w])
                    x = y
            elif kind == 'upsample':
                _, stride = sec
                x = np.repeat(np.repeat(x, stride, 0), stride, 1)
            elif kind == 'yolo':
                yolo_inputs.append(outs[li - 1])
                x = outs[li - 1]
            outs.append(x)
        return yolo_inputs  # in cfg order (tiny: lbbox then mbbox)


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


@pytest.mark.slow
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


@pytest.mark.slow
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


# --- Full YOLOv4 (CSPDarknet53 + SPP + PANet) -------------------------------
#
# The canonical public yolov4.cfg section list (AlexeyAB/darknet), 162
# sections in file order. The repeated CSP residual triplets
# [conv f 1x1 mish; conv f' 3x3 mish; shortcut -3] are emitted by a loop —
# that repetition IS the cfg's structure — while every stage boundary,
# route offset (section-relative, a representation the flax module never
# uses), SPP pool and head section is written out explicitly. This is the
# detector topology behind the models the reference actually ships
# (`/root/reference/docs/TRAINING.md:64`).

def _csp_residuals(n, f1, f2):
    out = []
    for _ in range(n):
        out += [('conv', f1, 1, 1, True, 'mish'),
                ('conv', f2, 3, 1, True, 'mish'),
                ('shortcut', -3)]
    return out


def _conv_leaky(filters, size):
    return ('conv', filters, size, 1, True, 'leaky')


YOLOV4_CFG = (
    [
        ('conv', 32, 3, 1, True, 'mish'),     # 0
        # downsample 1 (special narrow CSP: split width 64, residual 32->64)
        ('conv', 64, 3, 2, True, 'mish'),     # 1
        ('conv', 64, 1, 1, True, 'mish'),     # 2  bypass
        ('route', [-2], 1, 0),                # 3  back to 1
        ('conv', 64, 1, 1, True, 'mish'),     # 4  main
        ('conv', 32, 1, 1, True, 'mish'),     # 5
        ('conv', 64, 3, 1, True, 'mish'),     # 6
        ('shortcut', -3),                     # 7  4 + 6
        ('conv', 64, 1, 1, True, 'mish'),     # 8
        ('route', [-1, -7], 1, 0),            # 9  concat(8, 2)
        ('conv', 64, 1, 1, True, 'mish'),     # 10
        # downsample 2
        ('conv', 128, 3, 2, True, 'mish'),    # 11
        ('conv', 64, 1, 1, True, 'mish'),     # 12 bypass
        ('route', [-2], 1, 0),                # 13
        ('conv', 64, 1, 1, True, 'mish'),     # 14 main
    ]
    + _csp_residuals(2, 64, 64)               # 15-20
    + [
        ('conv', 64, 1, 1, True, 'mish'),     # 21
        ('route', [-1, -10], 1, 0),           # 22 concat(21, 12)
        ('conv', 128, 1, 1, True, 'mish'),    # 23
        # downsample 3
        ('conv', 256, 3, 2, True, 'mish'),    # 24
        ('conv', 128, 1, 1, True, 'mish'),    # 25 bypass
        ('route', [-2], 1, 0),                # 26
        ('conv', 128, 1, 1, True, 'mish'),    # 27 main
    ]
    + _csp_residuals(8, 128, 128)             # 28-51
    + [
        ('conv', 128, 1, 1, True, 'mish'),    # 52
        ('route', [-1, -28], 1, 0),           # 53 concat(52, 25)
        ('conv', 256, 1, 1, True, 'mish'),    # 54  -> route_1 (stride 8)
        # downsample 4
        ('conv', 512, 3, 2, True, 'mish'),    # 55
        ('conv', 256, 1, 1, True, 'mish'),    # 56 bypass
        ('route', [-2], 1, 0),                # 57
        ('conv', 256, 1, 1, True, 'mish'),    # 58 main
    ]
    + _csp_residuals(8, 256, 256)             # 59-82
    + [
        ('conv', 256, 1, 1, True, 'mish'),    # 83
        ('route', [-1, -28], 1, 0),           # 84 concat(83, 56)
        ('conv', 512, 1, 1, True, 'mish'),    # 85  -> route_2 (stride 16)
        # downsample 5
        ('conv', 1024, 3, 2, True, 'mish'),   # 86
        ('conv', 512, 1, 1, True, 'mish'),    # 87 bypass
        ('route', [-2], 1, 0),                # 88
        ('conv', 512, 1, 1, True, 'mish'),    # 89 main
    ]
    + _csp_residuals(4, 512, 512)             # 90-101
    + [
        ('conv', 512, 1, 1, True, 'mish'),    # 102
        ('route', [-1, -16], 1, 0),           # 103 concat(102, 87)
        ('conv', 1024, 1, 1, True, 'mish'),   # 104
        # --- SPP ---
        _conv_leaky(512, 1),                  # 105
        _conv_leaky(1024, 3),                 # 106
        _conv_leaky(512, 1),                  # 107
        ('maxpool', 5, 1),                    # 108
        ('route', [-2], 1, 0),                # 109 -> 107
        ('maxpool', 9, 1),                    # 110
        ('route', [-4], 1, 0),                # 111 -> 107
        ('maxpool', 13, 1),                   # 112
        ('route', [-1, -3, -5, -6], 1, 0),    # 113 concat(112,110,108,107)
        _conv_leaky(512, 1),                  # 114
        _conv_leaky(1024, 3),                 # 115
        _conv_leaky(512, 1),                  # 116  -> route_3 (stride 32)
        # --- PANet top-down ---
        _conv_leaky(256, 1),                  # 117
        ('upsample', 2),                      # 118
        ('route', [85], 1, 0),                # 119
        _conv_leaky(256, 1),                  # 120
        ('route', [-1, -3], 1, 0),            # 121 concat(120, 118)
        _conv_leaky(256, 1),                  # 122
        _conv_leaky(512, 3),                  # 123
        _conv_leaky(256, 1),                  # 124
        _conv_leaky(512, 3),                  # 125
        _conv_leaky(256, 1),                  # 126  -> route_16
        _conv_leaky(128, 1),                  # 127
        ('upsample', 2),                      # 128
        ('route', [54], 1, 0),                # 129
        _conv_leaky(128, 1),                  # 130
        ('route', [-1, -3], 1, 0),            # 131 concat(130, 128)
        _conv_leaky(128, 1),                  # 132
        _conv_leaky(256, 3),                  # 133
        _conv_leaky(128, 1),                  # 134
        _conv_leaky(256, 3),                  # 135
        _conv_leaky(128, 1),                  # 136  -> route_8
        # small-object head (stride 8)
        _conv_leaky(256, 3),                  # 137
        ('conv', 255, 1, 1, False, 'linear'),  # 138 = conv_93 (sbbox)
        ('yolo',),                            # 139
        # bottom-up
        ('route', [-4], 1, 0),                # 140 -> 136
        ('conv', 256, 3, 2, True, 'leaky'),   # 141
        ('route', [-1, -16], 1, 0),           # 142 concat(141, 126)
        _conv_leaky(256, 1),                  # 143
        _conv_leaky(512, 3),                  # 144
        _conv_leaky(256, 1),                  # 145
        _conv_leaky(512, 3),                  # 146
        _conv_leaky(256, 1),                  # 147
        _conv_leaky(512, 3),                  # 148
        ('conv', 255, 1, 1, False, 'linear'),  # 149 = conv_101 (mbbox)
        ('yolo',),                            # 150
        ('route', [-4], 1, 0),                # 151 -> 147
        ('conv', 512, 3, 2, True, 'leaky'),   # 152
        ('route', [-1, -37], 1, 0),           # 153 concat(152, 116)
        _conv_leaky(512, 1),                  # 154
        _conv_leaky(1024, 3),                 # 155
        _conv_leaky(512, 1),                  # 156
        _conv_leaky(1024, 3),                 # 157
        _conv_leaky(512, 1),                  # 158
        _conv_leaky(1024, 3),                 # 159
        ('conv', 255, 1, 1, False, 'linear'),  # 160 = conv_109 (lbbox)
        ('yolo',),                            # 161
    ])


@pytest.mark.slow
def test_full_yolov4_matches_independent_darknet_interpreter(tmp_path):
    """The 110-conv full YOLOv4 (the topology behind the reference's shipped
    detector SavedModel) vs the from-scratch numpy cfg interpreter on a
    random darknet-format weight file. Pins the CSPDarknet53 narrow stage-1
    CSP, all four wide CSP stages, the SPP pool/route chain, both PANet
    route -1,-3 merges, the -16/-37 bottom-up concats, and the full
    weight-file section order."""
    import jax
    import jax.numpy as jnp

    from metrabs_tpu.detect.yolov4 import YOLOv4, load_darknet_weights

    assert sum(1 for s in YOLOV4_CFG if s[0] == 'conv') == 110
    data = _make_weight_bytes(YOLOV4_CFG, seed=11)
    path = tmp_path / 'yolov4.weights'
    path.write_bytes(data)

    interp = DarknetInterpreter(YOLOV4_CFG, data)
    rng = np.random.default_rng(7)
    image = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    want_sbbox, want_mbbox, want_lbbox = interp(image)

    model = YOLOv4(dtype=jnp.float32, scan_repeats=False)
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    variables = load_darknet_weights(model, variables, str(path))
    sbbox, mbbox, lbbox = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, image[None])

    np.testing.assert_allclose(
        np.asarray(sbbox)[0], want_sbbox, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(mbbox)[0], want_mbbox, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(lbbox)[0], want_lbbox, rtol=3e-4, atol=3e-4)


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
