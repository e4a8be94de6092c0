"""Spatial partitioning (TPU.MESH_SPATIAL): the (data, space) mesh splits
every image canvas's H axis over `space`; GSPMD spatially partitions the
backbone convs, inserting halo exchanges itself. These tests prove (a) the
placement helpers shard what they claim, and (b) the full triplet-DA train
step on a dp2 x sp4 mesh computes the same losses and parameter updates as
the 1-device step — the scaling mode the reference's DDP cannot express
(a convolution cannot be split across NCCL ranks; SURVEY §2.9).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as entry
from da_detect_tpu.parallel import (batch_sharding, make_mesh, put_batch,
                                    replicate, shard_batch)


def test_batch_sharding_places_canvas_over_space():
    cfg = entry._flagship_cfg(canvas=(64, 96))
    batch, targets = entry._batch(cfg, 4, seed=0)
    mesh = make_mesh(8, spatial=4)  # data=2, space=4
    sharding = batch_sharding(mesh)
    b = put_batch(batch, sharding)
    t = put_batch(targets, sharding)

    # images: [B=4, H=64, W, 3] -> per-shard [2, 16, W, 3]
    shard_shapes = {s.data.shape for s in b.images.addressable_shards}
    assert shard_shapes == {(2, 16, 96, 3)}, shard_shapes
    # metadata stays data-sharded (replicated over space)
    assert {s.data.shape for s in b.sizes.addressable_shards} == {(2, 2)}
    # targets: plain leading-axis data sharding, 4-D masks untouched by the
    # ImageBatch special case
    g = targets.boxes.shape[1]
    assert {s.data.shape for s in t.boxes.addressable_shards} == {(2, g, 4)}


def test_make_mesh_spatial_validation():
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(8, spatial=3)
    mesh = make_mesh(8, spatial=2)
    assert dict(mesh.shape) == {"data": 4, "space": 2}
    # spatial=1 keeps the 1-D reference-equivalent mesh
    assert make_mesh(8).axis_names == ("data",)


@pytest.mark.slow  # two full-step compiles, minutes on 1 CPU core
def test_spatial_step_matches_single_device(flagship_tiny_sharded):
    n = len(jax.devices())
    assert n == 8, "conftest should provide 8 virtual CPU devices"
    # same model/init/step as the other sharded-equivalence tests (shared
    # session fixture; params are batch-size-agnostic) — only the batch is
    # smaller here so the (data=2, space=4) mesh divides it
    fx = flagship_tiny_sharded
    cfg, state, step = fx["cfg"], fx["state"], fx["step"]

    k = 2  # triples: data axis 2, space axis 4
    host_sample = []
    for d, src in ((0, True), (1, False), (2, False)):
        b, t = entry._batch(cfg, k, seed=d, is_source=src)
        host_sample += [b, t]
    host_sample = tuple(host_sample)

    results = {}
    for label, mesh in (("dp2xsp4", make_mesh(8, spatial=4)),
                        ("n1", make_mesh(1))):
        sample = shard_batch(host_sample, mesh)
        st = replicate(state, mesh)
        new_state, metrics = step(st, *sample)
        metrics = jax.device_get(metrics)
        assert np.isfinite(metrics["loss_total"]), metrics
        results[label] = (jax.device_get(new_state.params), metrics)

    params_sp, metrics_sp = results["dp2xsp4"]
    params_1, metrics_1 = results["n1"]
    for key in metrics_1:
        np.testing.assert_allclose(metrics_sp[key], metrics_1[key], rtol=1e-4,
                                   atol=1e-6, err_msg=f"loss {key} diverges")
    flat_sp = jax.tree_util.tree_leaves_with_path(params_sp)
    flat_1 = dict(jax.tree_util.tree_leaves_with_path(params_1))
    assert len(flat_sp) == len(flat_1)
    for path, leaf in flat_sp:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_1[path]), rtol=1e-4, atol=1e-6,
            err_msg=f"updated param {jax.tree_util.keystr(path)} diverges "
                    "between dp2 x sp4 and 1-device training")

    # N-step trajectory on the shared k=8 fixture batch (data axis 2
    # divides it): margins + composed updates stay shard-invariant under
    # spatial partitioning (round-4 verdict item 5)
    traj = fx["trajectory"]
    sp_mesh = make_mesh(8, spatial=4)
    margins_sp, final_sp, _ = fx["run_trajectory"](sp_mesh, replicate,
                                                   shard_batch)
    np.testing.assert_allclose(margins_sp, traj["margins_img"], atol=1e-6,
                               err_msg="DAState margin trajectory diverges "
                                       "under spatial partitioning")
    flat_spn = jax.tree_util.tree_leaves_with_path(final_sp)
    flat_1n = dict(jax.tree_util.tree_leaves_with_path(traj["final_params"]))
    for path, leaf in flat_spn:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_1n[path]), rtol=3e-4, atol=3e-6,
            err_msg=f"{traj['n_steps']}-step param "
                    f"{jax.tree_util.keystr(path)} diverges between "
                    "dp2 x sp4 and 1-device training")
