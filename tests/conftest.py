"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the multi-device test story the
reference lacks — SURVEY §4)."""

import os

# Detach from the axon TPU relay for CPU test runs: with PALLAS_AXON_POOL_IPS
# set, every interpreter registers the axon PJRT plugin through the tunnel,
# which intermittently stalls for minutes. (Relevant only on the axon dev
# machine; harmless elsewhere.)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

# The env vars above are read by jax at *import* time — but installed pytest
# plugins (jaxtyping's, transitively hypothesis/typeguard) import jax BEFORE
# any conftest runs, so under the canonical `pytest tests/` invocation from a
# TPU-attached shell the ambient platform (axon TPU) won the default-backend
# race and the whole suite silently ran on the chip (root cause of the
# round-1 order-dependent test_batch_mesh_divisibility_guard failure).
# config.update is effective until the first backend initialization, which
# plugin import does not trigger — force it here as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# The suite is compile-dominated on CPU (the e2e tests compile full train
# steps); the persistent cache makes re-runs ~2-3x faster. Safe across code
# changes (keyed by HLO hash) and across VM migrations (setup_environment
# scopes the cpu cache dir by a host-ISA fingerprint).
from da_detect_tpu.utils.env import setup_environment  # noqa: E402

setup_environment()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def flagship_tiny_sharded():
    """Shared stack for the sharded-equivalence tests (test_multichip_step,
    test_tensor_parallel, test_spatial_partition): ONE model + init and ONE
    single-device baseline step on the shared batch (8 triples), so each
    test pays only its own sharded compile instead of re-initializing and
    re-deriving the same baseline (was: 3 inits + 3 identical n1 steps)."""
    import __graft_entry__ as entry
    import numpy as np
    from da_detect_tpu.engine.trainer import create_train_state, make_train_step
    from da_detect_tpu.models import build_detection_model
    from da_detect_tpu.parallel import data_sharding, make_mesh, replicate

    cfg = entry._flagship_cfg(canvas=(64, 96), train_tops=(64, 16))
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_GT_BOXES = 8
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.SOLVER.IMS_PER_BATCH = 16
    # enable the adaptive margin (the shipped default max==initial freezes
    # it) so the cross-step DAState becomes a live equivalence signal.
    # margin -0.5: growth fires only on EXACTLY-zero loss; a random-init
    # backbone has dead (ReLU-zero) feature rows where d(a,n) == d(a,p),
    # each contributing max(margin, 0) to the hinge — only a non-positive
    # margin keeps the loss exactly 0 (growth arithmetic unchanged; see
    # __graft_entry__._dryrun_impl, same crafting)
    cfg.MODEL.DA_HEADS.TRIPLET_MAX_MARGIN = 3.0
    cfg.MODEL.DA_HEADS.TRIPLET_MARGIN_IMG = -0.5
    model = build_detection_model(cfg)

    # positive := pixel copy of the source (the ALIGNMENT data contract,
    # reference build.py:40-47 there) -> identical backbone features ->
    # image-triplet hinge exactly 0 -> the margin grows by lr each step
    # AFTER the first (DAState.create seeds last loss 1.0, matching the
    # reference's `triplet_img = [1]`, da_heads.py:113 there).
    b_s, t_s = entry._batch(cfg, 8, seed=0, is_source=True)
    b_p = b_s.replace(is_source=jax.numpy.zeros_like(b_s.is_source))
    # negative: far-away pixels so d(anchor, negative) clears the margin
    b_n = b_p.replace(images=b_s.images + 200.0)
    host_sample = (b_s, t_s, b_p, t_s, b_n, t_s)

    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   host_sample, "cosine")
    step = make_train_step(model, tx, aligned=True, donate=False)

    n_steps = 3
    mesh1 = make_mesh(1)
    sample1 = tuple(jax.device_put(a, data_sharding(mesh1))
                    for a in host_sample)
    st = replicate(state, mesh1)
    margins, losses, step1 = [], [], None
    for i in range(n_steps):
        st, metrics = step(st, *sample1)
        metrics = jax.device_get(metrics)
        assert np.isfinite(metrics["loss_total"]), metrics
        margins.append(float(st.da_state.margin_img))
        losses.append({k: float(v) for k, v in metrics.items()})
        if i == 0:
            step1 = (jax.device_get(st.params), metrics)
    # the margin really moves: flat at step 1 (seeded last-loss 1.0), then
    # +lr per zero-loss step — any sharding must reproduce this exactly
    np.testing.assert_allclose(margins, [-0.5, -0.499, -0.498], atol=1e-6)
    assert losses[0]["triplet_loss_image"] == 0.0
    trajectory = dict(margins_img=margins, losses=losses,
                      final_params=jax.device_get(st.params),
                      n_steps=n_steps)

    def run_trajectory(mesh, place_state, shard_sample):
        """Run the SAME n-step trajectory under a different sharding;
        returns (margin trajectory, final params, final metrics)."""
        st = place_state(state, mesh)
        sm = shard_sample(host_sample, mesh)
        m = None
        traj = []
        for _ in range(n_steps):
            st, m = step(st, *sm)
            traj.append(float(st.da_state.margin_img))
        return traj, jax.device_get(st.params), jax.device_get(m)

    return dict(cfg=cfg, model=model, host_sample=host_sample, state=state,
                step=step, baseline=step1, trajectory=trajectory,
                run_trajectory=run_trajectory)
