"""Tensor-parallel (``model`` mesh axis) equivalence on the virtual 8-device
CPU mesh.

``shard_model`` (parallel/mesh.py) splits every wide trailing channel axis of
the parameter/optimizer pytrees over the ``model`` axis and leaves the jitted
step untouched — GSPMD derives the Megatron-style collectives. This proves
the placement is *semantics-free*: a (data=4, model=2) train step computes
the same losses and updated parameters as the pure data-parallel step on the
identical batch, up to float reassociation. The reference has no counterpart
(DDP replicates parameters by construction — SURVEY §2.9).
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from da_detect_tpu.parallel import (make_mesh, model_axis_size,
                                    shard_batch, shard_model)

pytestmark = pytest.mark.slow  # two full-step compiles, minutes on 1 CPU core


def test_model_sharded_step_matches_data_parallel(flagship_tiny_sharded):
    n = len(jax.devices())
    assert n == 8, "conftest should provide 8 virtual CPU devices"
    fx = flagship_tiny_sharded
    host_sample, state, step = fx["host_sample"], fx["state"], fx["step"]

    mesh = make_mesh(8, model=2)
    sample = shard_batch(host_sample, mesh)
    assert model_axis_size(mesh) > 1
    st = shard_model(state, mesh)

    # the placement must actually shard the wide channel axes —
    # otherwise this test silently degrades to plain dp
    def on_model(leaf):
        return (isinstance(leaf.sharding, NamedSharding)
                and "model" in tuple(leaf.sharding.spec))

    sharded = [
        (jax.tree_util.keystr(path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(st.params)
        if on_model(leaf)
    ]
    assert len(sharded) > 10, "shard_model left everything replicated"
    for _, leaf in sharded:
        assert leaf.shape[-1] % 2 == 0 and leaf.shape[-1] >= 256
    narrow = [p for p, l in
              jax.tree_util.tree_leaves_with_path(st.params)
              if l.ndim >= 1 and l.shape[-1] < 256 and on_model(l)]
    assert not narrow, f"narrow axes must stay replicated: {narrow}"

    new_state, metrics = step(st, *sample)
    metrics_tp = jax.device_get(metrics)
    assert np.isfinite(metrics_tp["loss_total"]), metrics_tp
    params_tp = jax.device_get(new_state.params)

    params_1, metrics_1 = fx["baseline"]  # shared n1 run of the same batch
    for k in metrics_1:
        np.testing.assert_allclose(
            metrics_tp[k], metrics_1[k], rtol=1e-3, atol=1e-5,
            err_msg=f"loss {k} diverges under tensor parallelism")
    flat_tp = jax.tree_util.tree_leaves_with_path(params_tp)
    flat_1 = dict(jax.tree_util.tree_leaves_with_path(params_1))
    assert len(flat_tp) == len(flat_1)
    for path, leaf in flat_tp:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_1[path]), rtol=1e-3, atol=1e-5,
            err_msg=f"updated param {jax.tree_util.keystr(path)} diverges "
                    "between (data=4, model=2) and 1-device training")

    # N-step trajectory: margin schedule + composed updates stay
    # shard-invariant under tensor parallelism (round-4 verdict item 5)
    traj = fx["trajectory"]
    margins_tp, final_tp, _ = fx["run_trajectory"](mesh, shard_model,
                                                   shard_batch)
    np.testing.assert_allclose(margins_tp, traj["margins_img"], atol=1e-6,
                               err_msg="DAState margin trajectory diverges "
                                       "under tensor parallelism")
    flat_tpn = jax.tree_util.tree_leaves_with_path(final_tp)
    flat_1n = dict(jax.tree_util.tree_leaves_with_path(traj["final_params"]))
    for path, leaf in flat_tpn:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_1n[path]), rtol=3e-3, atol=3e-5,
            err_msg=f"{traj['n_steps']}-step param "
                    f"{jax.tree_util.keystr(path)} diverges between "
                    "(data=4, model=2) and 1-device training")


def test_make_mesh_axes_and_guards():
    assert make_mesh(8, model=2).axis_names == ("data", "model")
    assert make_mesh(8, spatial=2, model=2).axis_names == (
        "data", "space", "model")
    assert model_axis_size(make_mesh(8)) == 1
    assert model_axis_size(make_mesh(8, model=4)) == 4
    with pytest.raises(ValueError):
        make_mesh(8, spatial=3, model=2)  # 8 % 6 != 0
