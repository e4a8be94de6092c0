import jax.numpy as jnp
import numpy as np

from da_detect_tpu.ops import box_ops


def np_iou(a, b, plus1=True):
    off = 1.0 if plus1 else 0.0
    area_a = (a[:, 2] - a[:, 0] + off) * (a[:, 3] - a[:, 1] + off)
    area_b = (b[:, 2] - b[:, 0] + off) * (b[:, 3] - b[:, 1] + off)
    out = np.zeros((len(a), len(b)))
    for i in range(len(a)):
        for j in range(len(b)):
            iw = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]) + off
            ih = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]) + off
            inter = max(iw, 0) * max(ih, 0)
            out[i, j] = inter / (area_a[i] + area_b[j] - inter)
    return out


def rand_boxes(n, seed=0, size=100.0):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, size / 2, n)
    h = rng.uniform(1, size / 2, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_iou_matches_numpy():
    a, b = rand_boxes(13, 0), rand_boxes(7, 1)
    for plus1 in (True, False):
        got = np.asarray(box_ops.box_iou(jnp.asarray(a), jnp.asarray(b), plus1))
        np.testing.assert_allclose(got, np_iou(a, b, plus1), rtol=1e-5)


def test_encode_decode_roundtrip():
    props = rand_boxes(20, 2)
    gts = rand_boxes(20, 3)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = box_ops.encode_boxes(jnp.asarray(gts), jnp.asarray(props), w)
    rec = box_ops.decode_boxes(deltas, jnp.asarray(props), w)
    np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-3, atol=5e-3)


def test_decode_multiclass_layout():
    props = rand_boxes(5, 4)
    deltas = jnp.asarray(np.random.RandomState(0).randn(5, 8).astype(np.float32))
    out = box_ops.decode_boxes(deltas, jnp.asarray(props))
    # class-k slice must equal decoding that slice alone
    out_k = box_ops.decode_boxes(deltas[:, 4:8], jnp.asarray(props))
    np.testing.assert_allclose(np.asarray(out[:, 4:8]), np.asarray(out_k), rtol=1e-6)


def test_clip_and_minsize():
    boxes = jnp.asarray([[-10.0, -5.0, 120.0, 90.0], [5.0, 5.0, 6.0, 6.0]])
    clipped = box_ops.clip_boxes(boxes, 100, 110)
    np.testing.assert_allclose(np.asarray(clipped[0]), [0, 0, 109, 90])
    mask = box_ops.min_size_mask(boxes, 5.0)
    assert bool(mask[0]) and not bool(mask[1])


def test_hflip_involution():
    b = jnp.asarray(rand_boxes(10, 5))
    np.testing.assert_allclose(
        np.asarray(box_ops.hflip_boxes(box_ops.hflip_boxes(b, 200), 200)),
        np.asarray(b), rtol=1e-6)


def test_xywh_roundtrip():
    b = jnp.asarray(rand_boxes(10, 6))
    for plus1 in (True, False):
        rec = box_ops.xywh_to_xyxy(box_ops.xyxy_to_xywh(b, plus1), plus1)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(b), rtol=1e-5)
