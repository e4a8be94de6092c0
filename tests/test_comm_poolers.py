"""Host-side comm helpers (reference utils/comm.py) and the multi-level
pooler's FPN level assignment (reference modeling/poolers.py LevelMapper)."""

import jax.numpy as jnp
import numpy as np

from da_detect_tpu.models import poolers
from da_detect_tpu.ops.roi_align import roi_align
from da_detect_tpu.utils import comm


# -- comm ---------------------------------------------------------------


def test_comm_single_process_paths():
    assert comm.get_world_size() == 1
    assert comm.get_rank() == 0
    assert comm.is_main_process()
    comm.synchronize()  # no-op, must not require a cluster
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    assert comm.reduce_dict({"x": 2.0}) == {"x": 2.0}
    assert comm.accumulate_predictions({3: "p"}) == {3: "p"}


def test_comm_multi_process_simulated(monkeypatch):
    """Drive the pickle/pad/unpickle gather logic with a faked 2-process
    world (the reference's pickle-over-ByteTensor all_gather semantics,
    comm.py:56-88)."""
    peers = [{"loss": 1.0, "n": 1}, {"loss": 3.0, "n": 2}]

    monkeypatch.setattr(comm.jax, "process_count", lambda: 2)

    import pickle

    class FakeMHU:
        @staticmethod
        def process_allgather(arr):
            # emulate each rank contributing its own payload; rank 0's input
            # is `arr`, rank 1's is rebuilt from peers[1]
            other = np.frombuffer(pickle.dumps(peers[1]), np.uint8)
            if arr.dtype == np.int64:  # the size exchange
                return np.stack([arr, np.asarray([other.size], np.int64)])
            pad = max(arr.size, other.size)
            rows = []
            for payload in (arr, other):
                row = np.zeros(pad, np.uint8)
                row[: payload.size] = payload
                rows.append(row)
            return np.stack(rows)

    import sys

    import jax.experimental
    monkeypatch.setattr(jax.experimental, "multihost_utils", FakeMHU,
                        raising=False)
    monkeypatch.setitem(sys.modules, "jax.experimental.multihost_utils",
                        FakeMHU)

    got = comm.all_gather(peers[0])
    assert got == peers

    red = comm.reduce_dict(peers[0])
    assert red == {"loss": 2.0, "n": 1.5}
    red_sum = comm.reduce_dict(peers[0], average=False)
    assert red_sum == {"loss": 4.0, "n": 3}

    # rank 0 contributes its own dict; the fake peer contributes peers[1]
    merged = comm.accumulate_predictions({0: "r0"})
    assert merged == {0: "r0", "loss": 3.0, "n": 2}


# -- poolers ------------------------------------------------------------


def test_assign_levels_fpn_eqn1():
    """Eqn. 1 of the FPN paper with the reference's +1 legacy area and
    clamping (poolers.py:37-42)."""
    # scales 1/4..1/32 -> k_min=2, k_max=5
    boxes = jnp.asarray([
        [0, 0, 111, 111],    # sqrt(area)=112 -> lvl 4 + log2(112/224) = 3
        [0, 0, 223, 223],    # 224 -> lvl 4
        [0, 0, 447, 447],    # 448 -> lvl 5
        [0, 0, 15, 15],      # tiny -> clamped to k_min=2
        [0, 0, 2047, 2047],  # huge -> clamped to k_max=5
    ], jnp.float32)
    lvls = poolers.assign_levels(boxes, k_min=2, k_max=5)
    np.testing.assert_array_equal(np.asarray(lvls), [1, 2, 3, 0, 3])


def test_pool_rois_selects_assigned_level():
    """Multi-level pooling must equal single-level ROIAlign on the ROI's
    assigned level (the one-hot select replaces the reference's per-level
    gather/scatter)."""
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.rand(1, 64 // s, 96 // s, 8).astype(np.float32))
             for s in (4, 8, 16, 32)]
    scales = (0.25, 0.125, 0.0625, 0.03125)
    # one ROI per level: side ~112 -> P3 is index 1 with k_min=2
    rois = jnp.asarray([[[4, 4, 60, 60],        # sqrt(~56^2) -> clamp P2
                         [8, 8, 8 + 111, 8 + 111],   # -> P3
                         [0, 0, 223, 223],      # -> P4
                         [0, 0, 447, 447]]], jnp.float32)
    out = poolers.pool_rois(feats, rois, scales=scales, output_size=7,
                            sampling_ratio=2)
    lvls = np.asarray(poolers.assign_levels(rois, 2, 5))[0]
    np.testing.assert_array_equal(lvls, [0, 1, 2, 3])
    for r, lvl in enumerate(lvls):
        want = roi_align(feats[lvl], rois[:, r:r + 1], spatial_scale=scales[lvl],
                         output_size=7, sampling_ratio=2)
        np.testing.assert_allclose(np.asarray(out[:, r:r + 1]),
                                   np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pool_rois_single_level_passthrough():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.rand(2, 16, 24, 4).astype(np.float32))
    rois = jnp.asarray(rng.rand(2, 3, 4).astype(np.float32) * 60)
    rois = jnp.concatenate([jnp.minimum(rois[..., :2], rois[..., 2:]),
                            jnp.maximum(rois[..., :2], rois[..., 2:])], -1)
    a = poolers.pool_rois([feat], rois, scales=(0.25,), output_size=7,
                          sampling_ratio=2)
    b = roi_align(feat, rois, spatial_scale=0.25, output_size=7,
                  sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
