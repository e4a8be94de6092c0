"""Mesh/sharding helpers on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8). The full sharded train step is
exercised by __graft_entry__.dryrun_multichip; these pin the helper
semantics the step relies on — especially triple co-location."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from da_detect_tpu.parallel import data_sharding, make_mesh, replicate, shard_batch
from da_detect_tpu.parallel.mesh import check_divisible


def _device_of_row(arr, row):
    for shard in arr.addressable_shards:
        idx = shard.index[0]
        lo = idx.start or 0
        hi = idx.stop if idx.stop is not None else arr.shape[0]
        if lo <= row < hi:
            return shard.device
    raise AssertionError(f"row {row} not found in any shard")


def test_shard_batch_colocates_triples():
    """Equal-index rows of separate per-domain arrays land on one device."""
    n = len(jax.devices())
    mesh = make_mesh(n)
    k = 2 * n
    slices = [shard_batch(jnp.arange(k * 3, dtype=jnp.float32).reshape(k, 3)
                          + 100 * d, mesh) for d in range(3)]
    for i in range(k):
        devs = {str(_device_of_row(s, i)) for s in slices}
        assert len(devs) == 1, f"triple {i} split across {devs}"


def test_shard_batch_partitions_leading_axis():
    mesh = make_mesh()
    n = mesh.devices.size
    x = shard_batch(jnp.zeros((n * 4, 7)), mesh)
    sizes = sorted(s.data.shape[0] for s in x.addressable_shards)
    assert sizes == [4] * n


def test_replicate_full_copy_per_device():
    mesh = make_mesh()
    tree = {"w": jnp.arange(12.0).reshape(3, 4)}
    rep = replicate(tree, mesh)
    for s in rep["w"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data),
                                      np.arange(12.0).reshape(3, 4))


def test_sharded_computation_stays_sharded():
    mesh = make_mesh()
    n = mesh.devices.size
    x = shard_batch(jnp.ones((n * 2, 5)), mesh)
    y = jax.jit(lambda a: a * 2 + 1)(x)
    assert y.sharding.is_equivalent_to(data_sharding(mesh), ndim=y.ndim)
    np.testing.assert_array_equal(np.asarray(y), np.full((n * 2, 5), 3.0))


def test_check_divisible():
    mesh = make_mesh()
    n = mesh.devices.size
    check_divisible(4 * n, mesh)
    check_divisible(6 * n, mesh, group=3)
    with pytest.raises(ValueError):
        check_divisible(n + 1, mesh) if n > 1 else (_ for _ in ()).throw(
            ValueError("1-device mesh divides everything"))
