"""Boxes/ImageBatch structure tests (reference tests exercise BoxList via
test_box_coder/test_segmentation_mask; here the padded pytree semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from da_detect_tpu.structures import Boxes, ImageBatch, Targets
from da_detect_tpu.structures.boxes import concat_boxes
from da_detect_tpu.utils.metric_logger import MetricLogger, SmoothedValue


def make_boxes():
    xyxy = jnp.asarray([[0, 0, 10, 10], [5, 5, 20, 20], [0, 0, 0, 0]],
                       jnp.float32)
    valid = jnp.asarray([True, True, False])
    return Boxes(xyxy=xyxy, valid=valid,
                 fields={"labels": jnp.asarray([1, 2, 0]),
                         "scores": jnp.asarray([0.9, 0.8, 0.0])})


def test_boxes_is_pytree():
    b = make_boxes()
    leaves = jax.tree_util.tree_leaves(b)
    assert len(leaves) == 4
    b2 = jax.tree_util.tree_map(lambda x: x, b)
    np.testing.assert_array_equal(np.asarray(b2.xyxy), np.asarray(b.xyxy))


def test_boxes_take_gathers_fields():
    b = make_boxes()
    out = b.take(jnp.asarray([1, 0]))
    np.testing.assert_array_equal(np.asarray(out.fields["labels"]), [2, 1])
    np.testing.assert_array_equal(np.asarray(out.xyxy[0]), [5, 5, 20, 20])
    # indices_valid masks out
    out2 = b.take(jnp.asarray([1, 2]), jnp.asarray([True, True]))
    np.testing.assert_array_equal(np.asarray(out2.valid), [True, False])


def test_boxes_geometry_masks():
    b = make_boxes()
    area = np.asarray(b.area(legacy_plus1=False))
    np.testing.assert_allclose(area, [100, 225, 0])
    clipped = b.clip_to_image(8, 8)
    assert float(clipped.xyxy[1, 2]) <= 8.0
    flipped = b.hflip(100).hflip(100)
    np.testing.assert_allclose(np.asarray(flipped.xyxy), np.asarray(b.xyxy))
    pruned = b.prune_small(12.0, legacy_plus1=False)
    np.testing.assert_array_equal(np.asarray(pruned.valid),
                                  [False, True, False])


def test_concat_boxes():
    b = make_boxes()
    cat = concat_boxes([b, b])
    assert cat.capacity == 6
    assert int(cat.num_valid()) == 4
    np.testing.assert_array_equal(np.asarray(cat.fields["labels"]),
                                  [1, 2, 0, 1, 2, 0])


def test_image_batch_concat_and_targets():
    def mk(b, src):
        return ImageBatch(images=jnp.zeros((b, 8, 8, 3)),
                          sizes=jnp.full((b, 2), 8, jnp.int32),
                          orig_sizes=jnp.full((b, 2), 16, jnp.int32),
                          is_source=jnp.full((b,), src))

    cat = mk(2, True).concat(mk(3, False))
    assert cat.batch_size == 5
    np.testing.assert_array_equal(np.asarray(cat.is_source),
                                  [True, True, False, False, False])
    t1 = Targets(boxes=jnp.zeros((2, 4, 4)), labels=jnp.zeros((2, 4), jnp.int32),
                 valid=jnp.zeros((2, 4), bool))
    t2 = Targets(boxes=jnp.zeros((1, 4, 4)), labels=jnp.zeros((1, 4), jnp.int32),
                 valid=jnp.ones((1, 4), bool),
                 masks=jnp.zeros((1, 4, 8, 8)))
    cat_t = t1.concat(t2)
    assert cat_t.boxes.shape[0] == 3
    assert cat_t.masks is None  # mixed presence degrades to None


def test_metric_logger():
    m = MetricLogger()
    for i in range(30):
        m.update(loss=float(i))
    sv: SmoothedValue = m.meters["loss"]
    assert sv.count == 30
    assert sv.median == 20.0  # window of 20: values 10..29, median idx 10
    assert abs(sv.avg - 19.5) < 1e-6
    assert abs(sv.global_avg - 14.5) < 1e-6
    assert "loss" in str(m)
