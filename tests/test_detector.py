import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metrabs_tpu.detect import yolov4


def test_decode_head_grid_alignment():
    # Raw zeros: sigmoid(0)=0.5 -> xy = (0.5*s - 0.5(s-1) + grid) * stride,
    # wh = anchors.
    gh = gw = 2
    raw = np.zeros((1, gh, gw, 3 * 85), np.float32)
    out = np.asarray(yolov4.decode_head(jnp.asarray(raw), 0, 416))
    assert out.shape == (1, gh * gw * 3, 85)
    s = yolov4.XYSCALE[0]
    expected_xy0 = (0.5 * s - 0.5 * (s - 1)) * yolov4.STRIDES[0]
    np.testing.assert_allclose(out[0, 0, :2], [expected_xy0, expected_xy0], atol=1e-5)
    np.testing.assert_allclose(out[0, 0, 2:4], yolov4.ANCHORS[0][0], atol=1e-4)
    # anchor index cycles fastest, then grid x, then grid y
    np.testing.assert_allclose(
        out[0, 3, :2], [expected_xy0 + yolov4.STRIDES[0], expected_xy0], atol=1e-5)
    np.testing.assert_allclose(out[0, 0, 4], 0.5, atol=1e-6)


def test_box_iou():
    a = jnp.asarray([[5.0, 5.0, 10.0, 10.0]])   # box [0,10]x[0,10]
    b = jnp.asarray([[10.0, 5.0, 10.0, 10.0],   # half overlap
                     [100.0, 100.0, 10.0, 10.0]])
    iou = np.asarray(yolov4.box_iou_xywh(a, b))
    np.testing.assert_allclose(iou[0, 0], 50.0 / 150.0, atol=1e-5)
    assert iou[0, 1] == 0


def test_box_nms_suppression():
    boxes = jnp.asarray([
        [10.0, 10.0, 20.0, 20.0],
        [11.0, 10.0, 20.0, 20.0],   # heavy overlap with first
        [100.0, 100.0, 20.0, 20.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.ones(3, bool)
    keep = np.asarray(yolov4.box_nms(boxes, scores, valid, 0.5, 10))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_box_nms_max_output():
    boxes = jnp.asarray([[i * 100.0, 0.0, 10.0, 10.0] for i in range(5)])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6, 0.5])
    keep = np.asarray(yolov4.box_nms(boxes, scores, jnp.ones(5, bool), 0.5, 2))
    assert keep.sum() == 2
    np.testing.assert_array_equal(keep, [True, True, False, False, False])


@pytest.fixture(scope='module')
def tiny_detector():
    model = yolov4.YOLOv4(num_classes=80, dtype=jnp.float32)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return yolov4.PersonDetector(model, variables, input_size=96, top_candidates=64)


def test_full_detector_shapes(tiny_detector, rng):
    images = rng.integers(0, 255, size=(2, 120, 160, 3), dtype=np.uint8)
    boxes5, valid = tiny_detector.detect_batched(
        images, threshold=0.0, max_detections=4)
    assert np.asarray(boxes5).shape == (2, 4, 5)
    assert np.asarray(valid).shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(boxes5)))


def test_detector_flip_aug_runs(tiny_detector, rng):
    images = rng.integers(0, 255, size=(1, 96, 96, 3), dtype=np.uint8)
    boxes5, valid = tiny_detector.detect_batched(
        images, threshold=0.0, max_detections=4, flip_aug=True)
    assert np.asarray(boxes5).shape == (1, 4, 5)


def test_unscale_uses_per_axis_factors(tiny_detector, rng):
    """Box unscale must use per-axis orig/target ratios
    (`person_detector.py:39-40`): target_h truncates (int(0.96*80)=76), so
    the short axis stretches by 80/76, not 1/0.96. Regression for a bug
    that divided both axes by the single pre-truncation factor."""
    import dataclasses
    det = dataclasses.replace(tiny_detector)  # input_size=96
    det._jitted = {}
    # One fake anchor: center (48, 48), wh (20, 30) in the 96x96
    # resized+padded frame, person score 1.
    fake = np.zeros((1, 4, 85), np.float32)
    fake[0, 0, :4] = [48.0, 48.0, 20.0, 30.0]
    fake[0, 0, 4] = 1.0
    fake[0, 0, 5 + yolov4.PERSON_CLASS] = 1.0
    det._forward = lambda variables, images_resized: jnp.asarray(fake)

    img = rng.integers(0, 255, size=(1, 80, 100, 3), dtype=np.uint8)
    boxes5, valid = det.detect_batched(img, threshold=0.5, max_detections=2)
    boxes5 = np.asarray(boxes5)
    assert np.asarray(valid)[0, 0]
    # orig 80x100, size 96 -> factor .96, target (76, 96), pad_h 20 (hp 10).
    x_factor, y_factor = 100 / 96, 80 / 76
    np.testing.assert_allclose(
        boxes5[0, 0, :4],
        [(48 - 10) * x_factor, (48 - 15 - 10) * y_factor,
         20 * x_factor, 30 * y_factor], rtol=1e-5)


def test_approx_top_k_matches_exact_on_separated_scores(tiny_detector, rng):
    """approx_top_k (serving mode) and the exact parity default must select
    the same detections when candidate scores are well separated — the only
    regime where approx_max_k's recall<1 could silently diverge is near-ties,
    which thresholding + NMS absorb. Exact lax.top_k is the default
    (reference parity, `multiperson_model.py:236-238`); this pins the two
    paths to agree so the opt-in stays a pure speed knob."""
    import dataclasses
    fake = np.zeros((1, 512, 85), np.float32)
    # 12 well-separated persons on a diagonal, scores 0.95 down to 0.40.
    for i in range(12):
        fake[0, i * 40, :4] = [8.0 + 7.0 * i, 8.0 + 7.0 * i, 6.0, 6.0]
        fake[0, i * 40, 4] = 1.0
        fake[0, i * 40, 5 + yolov4.PERSON_CLASS] = 0.95 - 0.05 * i
    img = rng.integers(0, 255, size=(1, 96, 96, 3), dtype=np.uint8)

    results = {}
    for approx in (False, True):
        det = dataclasses.replace(tiny_detector, approx_top_k=approx)
        det._jitted = {}
        det._forward = lambda variables, images_resized: jnp.asarray(fake)
        boxes5, valid = det.detect_batched(
            img, threshold=0.3, max_detections=8)
        results[approx] = (np.asarray(boxes5), np.asarray(valid))
    np.testing.assert_array_equal(results[False][1], results[True][1])
    np.testing.assert_allclose(results[False][0], results[True][0], rtol=1e-6)


def test_darknet_conv_count():
    """YOLOv4 (flat layout) must have exactly 110 conv sections with outputs
    at 93/101/109 (the canonical darknet layout the importer assumes)."""
    model = yolov4.YOLOv4(num_classes=80, dtype=jnp.float32, scan_repeats=False)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables['params']
    conv_ids = sorted(int(k.split('_')[1]) for k in params if k.startswith('conv_'))
    assert conv_ids == list(range(110)), (len(conv_ids), conv_ids[-5:])
    no_bn = [i for i in conv_ids if 'bn' not in params[f'conv_{i}']]
    assert no_bn == [93, 101, 109], no_bn


def test_yolo_flat_to_scanned_equivalence(rng):
    """Scanned and flat YOLOv4 produce identical outputs for converted
    weights."""
    x = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)), jnp.float32)
    flat = yolov4.YOLOv4(dtype=jnp.float32, scan_repeats=False)
    flat_vars = flat.init(jax.random.PRNGKey(3), x, train=False)
    scanned = yolov4.YOLOv4(dtype=jnp.float32, scan_repeats=True)
    template = scanned.init(jax.random.PRNGKey(0), x, train=False)
    converted = yolov4.yolo_flat_to_scanned(flat_vars, template)
    out_f = flat.apply(flat_vars, x, train=False)
    out_s = scanned.apply(converted, x, train=False)
    for a, b in zip(out_f, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


class TestYOLOv4Tiny:
    """The y4t detector variant (`docs/MODELS_6_DATASETS.md:17-18`)."""

    @pytest.fixture(scope='class')
    def tiny(self):
        model = yolov4.YOLOv4Tiny(num_classes=80, dtype=jnp.float32)
        x = jnp.zeros((1, 96, 96, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return model, variables

    def test_conv_layout(self, tiny):
        """21 conv sections in darknet cfg order; output convs (bias, no BN)
        at 17 (stride 32) and 20 (stride 16)."""
        model, variables = tiny
        params = variables['params']
        conv_ids = sorted(
            int(k.split('_')[1]) for k in params if k.startswith('conv_'))
        assert conv_ids == list(range(21)), conv_ids
        no_bn = [i for i in conv_ids if 'bn' not in params[f'conv_{i}']]
        assert no_bn == [17, 20], no_bn

    def test_head_shapes_and_strides(self, tiny):
        model, variables = tiny
        x = jnp.zeros((2, 96, 96, 3), jnp.float32)
        mbbox, lbbox = model.apply(variables, x, train=False)
        assert mbbox.shape == (2, 6, 6, 255)    # stride 16
        assert lbbox.shape == (2, 3, 3, 255)    # stride 32

    def test_decode_tables(self, tiny):
        model, _ = tiny
        anchors, strides, xyscale = model.decode_tables()
        assert strides == (16, 32) and xyscale == (1.05, 1.05)
        # The shared 81x82 anchor (cfg masks 1,2,3 / 3,4,5 overlap).
        np.testing.assert_array_equal(anchors[0][2], anchors[1][0])

    def test_darknet_import_roundtrip(self, tiny, tmp_path):
        """A synthetic yolov4-tiny.weights file of the canonical layout loads
        and lands in the right slots."""
        model, variables = tiny
        import flax
        flat = flax.traverse_util.flatten_dict(variables)
        blobs = [np.zeros(5, np.int32).tobytes()]
        rng = np.random.default_rng(0)
        for i in range(21):
            kernel = flat[('params', f'conv_{i}', 'conv', 'kernel')]
            kh, kw, cin, cout = kernel.shape
            if ('params', f'conv_{i}', 'bn', 'scale') in flat:
                # darknet order beta, gamma, mean, var — var must be positive.
                extra = np.concatenate([
                    rng.normal(size=3 * cout),
                    rng.uniform(0.5, 1.5, size=cout)])
            else:
                extra = rng.normal(size=cout)
            blobs.append(extra.astype(np.float32).tobytes())
            blobs.append(rng.normal(size=cout * cin * kh * kw)
                         .astype(np.float32).tobytes())
        path = tmp_path / 'yolov4-tiny.weights'
        path.write_bytes(b''.join(blobs))
        loaded = yolov4.load_darknet_weights(model, variables, str(path))
        # Spot-check: first conv kernel is the HWCK transpose of the file's
        # OIHW block, and the model still runs.
        x = jnp.zeros((1, 96, 96, 3), jnp.float32)
        mb, lb = model.apply(loaded, x, train=False)
        assert np.all(np.isfinite(np.asarray(mb)))
        k0 = np.asarray(loaded['params']['conv_0']['conv']['kernel'])
        assert k0.shape == (3, 3, 3, 32) and not np.allclose(k0, 0)

    def test_person_detector_with_tiny(self, tiny, rng):
        model, variables = tiny
        det = yolov4.PersonDetector(model, variables, input_size=96,
                                    top_candidates=64)
        images = rng.integers(0, 255, size=(2, 120, 160, 3), dtype=np.uint8)
        boxes5, valid = det.detect_batched(images, threshold=0.0,
                                           max_detections=4)
        assert np.asarray(boxes5).shape == (2, 4, 5)
        assert np.all(np.isfinite(np.asarray(boxes5)))

    def test_build_detector_model(self):
        assert isinstance(yolov4.build_detector_model('yolov4-tiny'),
                          yolov4.YOLOv4Tiny)
        assert isinstance(yolov4.build_detector_model('yolov4'), yolov4.YOLOv4)
        with pytest.raises(ValueError):
            yolov4.build_detector_model('yolov9')


def test_bf16_detector_close_to_f32(rng):
    """The bf16 compute path (serving default for packaged models) must
    produce decoded predictions close to f32: decode always upcasts to f32
    (`decode_head`), so the only divergence is net-internal rounding.

    Post-NMS boxes are NOT compared — with random weights all scores are
    near-identical, so tie-breaking in top_k/NMS reorders candidates under
    any epsilon perturbation. The stable contract is the pre-NMS decode."""
    model32 = yolov4.YOLOv4Tiny(num_classes=80, dtype=jnp.float32)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model32.init(jax.random.PRNGKey(2), x, train=False)
    model16 = yolov4.YOLOv4Tiny(num_classes=80, dtype=jnp.bfloat16)

    images = jnp.asarray(
        rng.integers(0, 255, size=(1, 96, 96, 3)), jnp.float32) / 255.0

    def decoded(model):
        det = yolov4.PersonDetector(model, variables, input_size=96,
                                    top_candidates=64)
        return np.asarray(jax.jit(det._forward)(variables, images))

    p32, p16 = decoded(model32), decoded(model16)
    assert p16.dtype == np.float32  # decode upcasts regardless of net dtype
    assert np.all(np.isfinite(p16))
    # Box centers within ~1px at 96px input, sizes within 5% relative,
    # objectness/class scores (post-sigmoid) within a small absolute delta.
    np.testing.assert_allclose(p16[..., :2], p32[..., :2], atol=1.5)
    np.testing.assert_allclose(p16[..., 2:4], p32[..., 2:4], rtol=0.08,
                               atol=0.5)
    np.testing.assert_allclose(p16[..., 4:], p32[..., 4:], atol=0.03)
