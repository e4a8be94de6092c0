"""NMS vs a clean-room numpy greedy reference (same role as the reference's
golden-value tests, tests/test_nms.py there)."""

import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.ops.nms import nms_mask, nms_topk


def np_greedy_nms(boxes, scores, thresh, plus1=True):
    off = 1.0 if plus1 else 0.0
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep[i] = True
        ai = (boxes[i, 2] - boxes[i, 0] + off) * (boxes[i, 3] - boxes[i, 1] + off)
        for j in order[oi + 1:]:
            if suppressed[j]:
                continue
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]) + off
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]) + off
            inter = max(iw, 0.0) * max(ih, 0.0)
            aj = (boxes[j, 2] - boxes[j, 0] + off) * (boxes[j, 3] - boxes[j, 1] + off)
            if inter / (ai + aj - inter) > thresh:
                suppressed[j] = True
    return keep


def make_cluster_boxes(n, seed, spread=600.0):
    """Heavily-overlapping clusters, the RPN-proposal regime."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(50, spread, (max(n // 16, 1), 2))
    out = []
    for k in range(n):
        cx, cy = centers[k % len(centers)]
        cx += rng.uniform(-20, 20)
        cy += rng.uniform(-20, 20)
        w, h = rng.uniform(20, 80, 2)
        out.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    boxes = np.asarray(out, np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n,seed,thresh", [(33, 0, 0.5), (200, 1, 0.7),
                                           (513, 2, 0.3), (1000, 3, 0.5)])
def test_nms_matches_greedy(n, seed, thresh):
    boxes, scores = make_cluster_boxes(n, seed)
    want = np_greedy_nms(boxes, scores, thresh)
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(n, bool), thresh))
    np.testing.assert_array_equal(got, want)


def test_nms_respects_validity():
    boxes, scores = make_cluster_boxes(64, 4)
    valid = np.arange(64) % 2 == 0
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(valid), 0.5))
    assert not np.any(got & ~valid)
    # equals greedy run on the valid subset
    sub = np_greedy_nms(boxes[valid], scores[valid], 0.5)
    np.testing.assert_array_equal(got[valid], sub)


def test_nms_chunk_boundary_invariance():
    boxes, scores = make_cluster_boxes(600, 5)
    ref = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(600, bool), 0.5, chunk=600))
    for chunk in (64, 128, 256):
        got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.ones(600, bool), 0.5, chunk=chunk))
        np.testing.assert_array_equal(got, ref)


def test_nms_topk():
    boxes, scores = make_cluster_boxes(300, 6)
    keep = np_greedy_nms(boxes, scores, 0.5)
    idx, vk = nms_topk(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.ones(300, bool), 0.5, k=50)
    idx, vk = np.asarray(idx), np.asarray(vk)
    n_kept = int(keep.sum())
    assert vk.sum() == min(50, n_kept)
    # returned indices are exactly the top-scoring survivors
    surv = np.argsort(-scores[keep], kind="stable")
    want = np.flatnonzero(keep)[surv][:min(50, n_kept)]
    np.testing.assert_array_equal(np.sort(idx[vk]), np.sort(want))
    # and sorted by descending score
    assert np.all(np.diff(scores[idx[vk]]) <= 1e-7)


def test_nms_topk_presorted_matches():
    """presorted=True on descending-score input == the sorting path, with
    invalid rows interspersed (the RPN _select_level calling pattern)."""
    boxes, scores = make_cluster_boxes(400, 21)
    rng = np.random.RandomState(22)
    valid = rng.rand(400) > 0.2
    order = np.argsort(-scores, kind="stable")
    bs, ss, vs = boxes[order], scores[order], valid[order]
    idx_a, val_a = nms_topk(jnp.asarray(bs), jnp.asarray(ss), jnp.asarray(vs),
                            0.5, 64)
    idx_b, val_b = nms_topk(jnp.asarray(bs), jnp.asarray(ss), jnp.asarray(vs),
                            0.5, 64, presorted=True)
    np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))
    np.testing.assert_array_equal(np.asarray(idx_a)[np.asarray(val_a)],
                                  np.asarray(idx_b)[np.asarray(val_b)])


# ------------------------- Caffe2 golden values -----------------------------
# Ported verbatim from the reference's tests/test_nms.py:16-56 and :59-216,
# which in turn mirror caffe2's UtilsNMSTest.TestNMS{,1} — these pin the
# exact Caffe2 tie-breaking / legacy +1 semantics that mAP parity rests on.

def test_nms_caffe2_golden_small():
    data = np.array([
        [10, 10, 50, 60, 0.5],
        [11, 12, 48, 60, 0.7],
        [8, 9, 40, 50, 0.6],
        [100, 100, 150, 140, 0.9],
        [99, 110, 155, 139, 0.8],
    ], dtype=np.float32)
    boxes, scores = data[:, :4], data[:, 4]
    golden = {0.1: [1, 3], 0.3: [1, 3], 0.5: [1, 3],
              0.8: [1, 2, 3, 4], 0.9: [0, 1, 2, 3, 4]}
    for thresh, want in golden.items():
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   jnp.ones(len(boxes), bool), thresh))
        np.testing.assert_array_equal(np.flatnonzero(keep), np.array(want),
                                      err_msg=f"thresh={thresh}")


def test_nms_caffe2_golden_53():
    boxes = np.array([
        [350.9821, 161.8200, 369.9685, 205.2372],
        [250.5236, 154.2844, 274.1773, 204.9810],
        [471.4920, 160.4118, 496.0094, 213.4244],
        [352.0421, 164.5933, 366.4458, 205.9624],
        [166.0765, 169.7707, 183.0102, 232.6606],
        [252.3000, 183.1449, 269.6541, 210.6747],
        [469.7862, 162.0192, 482.1673, 187.0053],
        [168.4862, 174.2567, 181.7437, 232.9379],
        [470.3290, 162.3442, 496.4272, 214.6296],
        [251.0450, 155.5911, 272.2693, 203.3675],
        [252.0326, 154.7950, 273.7404, 195.3671],
        [351.7479, 161.9567, 370.6432, 204.3047],
        [496.3306, 161.7157, 515.0573, 210.7200],
        [471.0749, 162.6143, 485.3374, 207.3448],
        [250.9745, 160.7633, 264.1924, 206.8350],
        [470.4792, 169.0351, 487.1934, 220.2984],
        [474.4227, 161.9546, 513.1018, 215.5193],
        [251.9428, 184.1950, 262.6937, 207.6416],
        [252.6623, 175.0252, 269.8806, 213.7584],
        [260.9884, 157.0351, 288.3554, 206.6027],
        [251.3629, 164.5101, 263.2179, 202.4203],
        [471.8361, 190.8142, 485.6812, 220.8586],
        [248.6243, 156.9628, 264.3355, 199.2767],
        [495.1643, 158.0483, 512.6261, 184.4192],
        [376.8718, 168.0144, 387.3584, 201.3210],
        [122.9191, 160.7433, 172.5612, 231.3837],
        [350.3857, 175.8806, 366.2500, 205.4329],
        [115.2958, 162.7822, 161.9776, 229.6147],
        [168.4375, 177.4041, 180.8028, 232.4551],
        [169.7939, 184.4330, 181.4767, 232.1220],
        [347.7536, 175.9356, 355.8637, 197.5586],
        [495.5434, 164.6059, 516.4031, 207.7053],
        [172.1216, 194.6033, 183.1217, 235.2653],
        [264.2654, 181.5540, 288.4626, 214.0170],
        [111.7971, 183.7748, 137.3745, 225.9724],
        [253.4919, 186.3945, 280.8694, 210.0731],
        [165.5334, 169.7344, 185.9159, 232.8514],
        [348.3662, 184.5187, 354.9081, 201.4038],
        [164.6562, 162.5724, 186.3108, 233.5010],
        [113.2999, 186.8410, 135.8841, 219.7642],
        [117.0282, 179.8009, 142.5375, 221.0736],
        [462.1312, 161.1004, 495.3576, 217.2208],
        [462.5800, 159.9310, 501.2937, 224.1655],
        [503.5242, 170.0733, 518.3792, 209.0113],
        [250.3658, 195.5925, 260.6523, 212.4679],
        [108.8287, 163.6994, 146.3642, 229.7261],
        [256.7617, 187.3123, 288.8407, 211.2013],
        [161.2781, 167.4801, 186.3751, 232.7133],
        [115.3760, 177.5859, 163.3512, 236.9660],
        [248.9077, 188.0919, 264.8579, 207.9718],
        [108.1349, 160.7851, 143.6370, 229.6243],
        [465.0900, 156.7555, 490.3561, 213.5704],
        [107.5338, 173.4323, 141.0704, 235.2910],
    ], dtype=np.float32)
    scores = np.array([
        0.1919, 0.3293, 0.0860, 0.1600, 0.1885, 0.4297, 0.0974, 0.2711,
        0.1483, 0.1173, 0.1034, 0.2915, 0.1993, 0.0677, 0.3217, 0.0966,
        0.0526, 0.5675, 0.3130, 0.1592, 0.1353, 0.0634, 0.1557, 0.1512,
        0.0699, 0.0545, 0.2692, 0.1143, 0.0572, 0.1990, 0.0558, 0.1500,
        0.2214, 0.1878, 0.2501, 0.1343, 0.0809, 0.1266, 0.0743, 0.0896,
        0.0781, 0.0983, 0.0557, 0.0623, 0.5808, 0.3090, 0.1050, 0.0524,
        0.0513, 0.4501, 0.4167, 0.0623, 0.1749,
    ], dtype=np.float32)
    golden = np.array([1, 6, 7, 8, 11, 12, 13, 14, 17, 18, 19, 21, 23, 24,
                       25, 26, 30, 32, 33, 34, 35, 37, 43, 44, 47, 50])
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.ones(len(boxes), bool), 0.5))
    np.testing.assert_array_equal(np.flatnonzero(keep), golden)
