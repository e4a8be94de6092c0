"""Long-tail component tests: deform PS-ROI pooling, multi-level DA variant,
attention modules, expected-results gate, masker."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.layers.deform_pool import DeformRoIPooling, deform_ps_roi_pool
from da_detect_tpu.models.attention import CAM, PAM
from da_detect_tpu.models.da_fpn import MultiLevelDAModule


def test_deform_ps_roi_pool():
    rng = np.random.RandomState(0)
    p, cpp = 3, 4
    feat = jnp.asarray(rng.randn(16, 24, p * p * cpp).astype(np.float32))
    rois = jnp.asarray([[10.0, 10.0, 100.0, 120.0],
                        [0.0, 0.0, 380.0, 250.0]], jnp.float32)
    out = deform_ps_roi_pool(feat, rois, None, spatial_scale=1.0 / 16,
                             output_size=p, out_channels=cpp)
    assert out.shape == (2, p, p, cpp)
    assert np.all(np.isfinite(np.asarray(out)))
    # with zero offsets the result is identical to no-offset pooling
    out0 = deform_ps_roi_pool(feat, rois, jnp.zeros((2, p, p, 2)),
                              spatial_scale=1.0 / 16, output_size=p,
                              out_channels=cpp)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out), rtol=1e-5)


def test_deform_roi_pooling_module():
    rng = np.random.RandomState(1)
    p, cpp = 3, 4
    feat = jnp.asarray(rng.randn(16, 24, p * p * cpp).astype(np.float32))
    rois = jnp.asarray([[10.0, 10.0, 100.0, 120.0]], jnp.float32)
    mod = DeformRoIPooling(spatial_scale=1.0 / 16, output_size=p,
                           out_channels=cpp)
    variables = mod.init(jax.random.PRNGKey(0), feat, rois)
    out = mod.apply(variables, feat, rois)
    assert out.shape == (1, p, p, cpp)
    # offset fc2 zero-init => equals plain PS pooling at init
    base = deform_ps_roi_pool(feat, rois, None, spatial_scale=1.0 / 16,
                              output_size=p, out_channels=cpp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=1e-4)


def test_multilevel_da_module():
    rng = np.random.RandomState(2)
    feats = [jnp.asarray(rng.randn(2, s, s, 32).astype(np.float32))
             for s in (16, 8, 4)]
    mod = MultiLevelDAModule()
    variables = mod.init(jax.random.PRNGKey(0), feats,
                         jnp.asarray([True, False]))
    losses = mod.apply(variables, feats, jnp.asarray([True, False]))
    assert {"loss_da_image_mlvl", "loss_scale_disc"} <= set(losses)
    for v in losses.values():
        assert np.isfinite(float(v))
    # GRL: gradient through the features must exist and be finite
    g = jax.grad(lambda f: sum(jnp.asarray(v) for v in mod.apply(
        variables, f, jnp.asarray([True, False])).values()))(feats)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)


@pytest.mark.parametrize("module", [PAM, CAM])
def test_attention_modules(module):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    mod = module()
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == x.shape
    # gamma zero-init: identity at initialization (SAGAN convention)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5)


def test_expected_results_gate():
    from da_detect_tpu.engine.inference import check_expected_results
    results = {"bbox": {"AP": 0.30}}
    check_expected_results(results, [("bbox", "AP", 0.3, 0.01)], 2.0)
    with pytest.raises(AssertionError):
        check_expected_results(results, [("bbox", "AP", 0.5, 0.01)], 2.0)


def test_masker_paste():
    from da_detect_tpu.data.masker import paste_masks, paste_single_crop
    prob = np.zeros((8, 8), np.float32)
    prob[2:6, 2:6] = 1.0
    boxes = np.asarray([[10.0, 20.0, 50.0, 60.0]])
    out = paste_masks(prob[None], boxes, (100, 100))
    assert out.shape == (1, 100, 100)
    ys, xs = np.nonzero(out[0])
    assert 10 <= xs.min() and xs.max() <= 51
    assert 20 <= ys.min() and ys.max() <= 61
    crop, (y0, x0) = paste_single_crop(prob, boxes[0], (100, 100))
    assert crop.sum() == out[0].sum()


def test_coco_demo_runs_on_image():
    """COCODemo.run_on_opencv_image end-to-end (reference demo/predictor.py
    COCODemo:173-263): transform -> jitted forward -> threshold -> overlay."""
    import numpy as np

    from da_detect_tpu.config import get_cfg
    from da_detect_tpu.demo.predictor import COCODemo

    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_SHAPE = (64, 96)
    cfg.INPUT.MIN_SIZE_TEST = 60
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    demo = COCODemo(cfg, confidence_threshold=0.0)
    img = (np.random.RandomState(0).rand(50, 70, 3) * 255).astype(np.uint8)
    out = demo.run_on_opencv_image(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    boxes, scores, labels = demo.compute_prediction(img)
    assert boxes.shape[1] == 4 and len(scores) == len(labels) == len(boxes)
    # per-class colors follow the reference palette trick (predictor.py:257)
    colors = demo.compute_colors_for_labels(np.array([1, 2]))
    assert colors[0] != colors[1]


def _tiny_demo_cfg():
    from da_detect_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_SHAPE = (64, 96)
    cfg.INPUT.MIN_SIZE_TEST = 60
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    return cfg


def test_coco_demo_mask_overlays_and_heatmap_montage():
    """MASK_ON demo parity (reference demo/predictor.py:287-357): full-frame
    pasted masks from compute_prediction, contour overlay, and the
    probability-heatmap montage (COLORMAP_JET grid)."""
    import numpy as np

    from da_detect_tpu.demo.predictor import COCODemo

    cfg = _tiny_demo_cfg()
    cfg.MODEL.MASK_ON = True
    demo = COCODemo(cfg, confidence_threshold=0.0)
    img = (np.random.RandomState(1).rand(50, 70, 3) * 255).astype(np.uint8)
    pred = demo.compute_prediction(img)
    boxes, scores, labels, masks, probs = pred
    assert masks.shape == (len(boxes), 50, 70) and masks.dtype == bool
    assert probs.ndim == 3 and len(probs) == len(boxes)
    out = demo.run_on_opencv_image(img)
    assert out.shape == img.shape
    heat = COCODemo(cfg, confidence_threshold=0.0, show_mask_heatmaps=True,
                    masks_per_dim=2)
    montage = heat.run_on_opencv_image(img)
    hm, wm = probs.shape[-2:]
    assert montage.shape == (2 * hm, 2 * wm, 3)  # JET colormap grid


def test_coco_demo_keypoint_overlay():
    """KEYPOINT_ON demo parity (reference vis_keypoints,
    demo/predictor.py:389-447): decoded per-detection keypoints in original
    coordinates + skeleton overlay."""
    import numpy as np

    from da_detect_tpu.demo.predictor import COCODemo

    cfg = _tiny_demo_cfg()
    cfg.MODEL.KEYPOINT_ON = True
    demo = COCODemo(cfg, confidence_threshold=0.0)
    img = (np.random.RandomState(2).rand(50, 70, 3) * 255).astype(np.uint8)
    boxes, scores, labels, kps = demo.compute_prediction(img)
    assert kps.shape[0] == len(boxes) and kps.shape[-1] == 3
    assert kps.shape[1] == cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES  # 17
    # keypoints land inside the original frame
    valid = kps[..., 2] > 0
    if valid.any():
        assert kps[..., 0][valid].max() <= 70 + 1e-3
        assert kps[..., 1][valid].max() <= 50 + 1e-3
    out = demo.run_on_opencv_image(img)
    assert out.shape == img.shape


def test_demo_walkthrough_runs(tmp_path, monkeypatch):
    """The notebook-equivalent walkthrough (demo/demo_walkthrough.py, the
    counterpart of the reference's demo/Mask_R-CNN_demo.ipynb) runs
    end-to-end: build COCODemo, predict on the synthetic image, write the
    overlay."""
    from da_detect_tpu.demo import demo_walkthrough as dw

    monkeypatch.chdir(tmp_path)
    demo = dw.build_demo(confidence_threshold=0.0)
    img = dw.load_bgr(None)
    out = demo.run_on_opencv_image(img)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert dw.main([]) == 0
