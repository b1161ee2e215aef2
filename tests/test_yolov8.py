"""YOLOv8 detector tests: architecture fidelity, decode math, importer
round-trip, PersonDetector integration (`person_detector.py` parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrabs_tpu.detect.yolov8 import (
    REG_MAX, YOLOv8, decode_heads, export_torch_style_state_dict,
    import_yolov8_from_torch)

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles (fast-tier durations r5); smoke tier = -m 'not oracle and not slow'


@pytest.mark.parametrize('size,published', [
    ('n', 3_157_200), ('s', 11_166_560), ('m', 25_902_640)])
def test_param_counts_match_ultralytics(size, published):
    """The strongest no-weights architecture check: trainable parameter
    counts must equal the published ultralytics totals minus the frozen
    16-element DFL expectation kernel (computed in decode here)."""
    model = YOLOv8(size=size)
    vs = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)))
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(vs['params']))
    assert n == published - REG_MAX


def test_forward_shapes_and_finiteness():
    model = YOLOv8(size='n', dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(2, 128, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    heads = model.apply(variables, x, train=False)
    assert len(heads) == 3
    for (box, cls), stride in zip(heads, (8, 16, 32)):
        assert box.shape == (2, 128 // stride, 96 // stride, 4 * REG_MAX)
        assert cls.shape == (2, 128 // stride, 96 // stride, 80)
    merged = decode_heads(heads)
    n_anchors = sum((128 // s) * (96 // s) for s in (8, 16, 32))
    assert merged.shape == (2, n_anchors, 4 + 80)
    assert np.all(np.isfinite(np.asarray(merged)))
    # class entries are sigmoid probabilities
    assert float(jnp.min(merged[..., 4:])) >= 0.0
    assert float(jnp.max(merged[..., 4:])) <= 1.0


def test_dfl_decode_golden():
    """Hand-built bin logits: a one-hot spike at bin k decodes to distance
    k cells from the cell center, scaled by the stride."""
    gh, gw = 2, 2
    box = np.full((1, gh, gw, 4, REG_MAX), -1e9, np.float32)
    # cell (0, 0): l=2, t=1, r=4, b=3  (cells)
    for side, k in enumerate([2, 1, 4, 3]):
        box[0, 0, 0, side, k] = 1e9
    # other cells: all distances 0
    box[0, 0, 1, :, 0] = 1e9
    box[0, 1, 0, :, 0] = 1e9
    box[0, 1, 1, :, 0] = 1e9
    cls = np.zeros((1, gh, gw, 80), np.float32)
    # Level list needs all three strides; make levels 2 and 3 trivial.
    tiny = (np.full((1, 1, 1, 4 * REG_MAX), -1e9, np.float32),
            np.zeros((1, 1, 1, 80), np.float32))
    merged = decode_heads([
        (jnp.asarray(box.reshape(1, gh, gw, -1)), jnp.asarray(cls)),
        tuple(map(jnp.asarray, tiny)), tuple(map(jnp.asarray, tiny))])
    # cell (0,0) center is (0.5, 0.5): x1=0.5-2, x2=0.5+4 -> cx=1.5, w=6
    # y1=0.5-1, y2=0.5+3 -> cy=1.5, h=4; scaled by stride 8.
    b = np.asarray(merged[0, 0, :4])
    np.testing.assert_allclose(b, [1.5 * 8, 1.5 * 8, 6 * 8, 4 * 8], atol=1e-3)


def test_importer_roundtrip():
    """export -> import reproduces the variable tree exactly and consumes
    every ultralytics-layout key."""
    model = YOLOv8(size='n', dtype=jnp.float32)
    rng = np.random.default_rng(3)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    # randomize so the round-trip is non-vacuous
    variables = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.normal(size=x.shape), np.float32), variables)
    sd = export_torch_style_state_dict(variables)
    assert any(k.startswith('model.22.cv3') for k in sd)
    fresh = model.init(jax.random.PRNGKey(2),
                       jnp.zeros((1, 64, 64, 3), jnp.float32))
    imported = import_yolov8_from_torch(sd, fresh)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(imported)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_importer_rejects_mismatched_size():
    model_n = YOLOv8(size='n', dtype=jnp.float32)
    vs_n = model_n.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    sd = export_torch_style_state_dict(vs_n)
    model_s = YOLOv8(size='s', dtype=jnp.float32)
    vs_s = jax.tree_util.tree_map(
        np.asarray, model_s.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3), jnp.float32)))
    with pytest.raises((KeyError, ValueError)):
        import_yolov8_from_torch(sd, vs_s)


def test_person_detector_with_yolov8(rng):
    """PersonDetector end-to-end with the v8 family: gamma-correct
    resize+pad preproc, decode, NMS, unscale back to original pixels."""
    from metrabs_tpu.detect.yolov4 import PersonDetector

    model = YOLOv8(size='n', dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 96, 96, 3), jnp.float32))
    det = PersonDetector(model, variables, input_size=96)
    images = rng.integers(0, 255, size=(2, 80, 120, 3), dtype=np.uint8)
    boxes5, valid = det.detect_batched(
        images, threshold=0.0, max_detections=4)
    assert boxes5.shape == (2, 4, 5)
    assert valid.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(boxes5)))
    # threshold 1.0: nothing passes
    _, valid_none = det.detect_batched(
        images, threshold=1.0, max_detections=4)
    assert not np.any(np.asarray(valid_none))


def test_build_detector_model_yolov8():
    from metrabs_tpu.detect.yolov4 import build_detector_model
    m = build_detector_model('yolov8m')
    assert isinstance(m, YOLOv8) and m.size == 'm'
    with pytest.raises(ValueError):
        build_detector_model('yolov9z')
