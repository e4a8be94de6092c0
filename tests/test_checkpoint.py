"""Checkpoint save/resume round trip (reference tests/checkpoint.py) — incl.
optimizer momentum and DA margin state, which the reference *broke* (its fork
disabled optimizer/scheduler restore; SURVEY §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from da_detect_tpu.config import get_cfg
from da_detect_tpu.engine.trainer import TrainState, create_train_state, make_train_step
from da_detect_tpu.models import build_detection_model
from da_detect_tpu.utils.checkpoint import Checkpointer
from tests.test_model_build import make_batch, tiny_cfg


def test_train_state_roundtrip(tmp_path):
    cfg = tiny_cfg()
    model = build_detection_model(cfg)
    batch, targets = make_batch(1)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   (batch, targets), "multistep")
    step_fn = make_train_step(model, tx, donate=False)
    state, _ = step_fn(state, batch, targets)
    state, _ = step_fn(state, batch, targets)

    ck = Checkpointer(str(tmp_path), max_to_keep=3)
    host_state = jax.device_get(state)
    ck.save(2, host_state)
    assert ck.has_checkpoint()
    assert (tmp_path / "last_checkpoint").read_text() == "2"

    restored, it = ck.resume(jax.device_get(state))
    assert it == 2
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        host_state.params, restored.params))
    assert chex_equal
    # optimizer momentum restored (the thing the reference dropped)
    mom_orig = jax.tree_util.tree_leaves(host_state.opt_state)
    mom_rest = jax.tree_util.tree_leaves(restored.opt_state)
    assert any(np.abs(np.asarray(m)).sum() > 0 for m in mom_orig)
    for a, b in zip(mom_orig, mom_rest):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # da margin state round-trips
    np.testing.assert_allclose(np.asarray(restored.da_state.margin_img),
                               np.asarray(host_state.da_state.margin_img))

    # training continues from the restored state
    state2, metrics = step_fn(restored, batch, targets)
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state2.step) == 3

    # model-only restore (test_net path)
    variables, it2 = ck.resume_model()
    assert it2 == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(variables["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(host_state.params)[0]))


def test_kill_and_resume_is_bit_identical(tmp_path):
    """Kill-and-resume equivalence drill (SURVEY §5.3/§5.4): train 2 steps,
    checkpoint, simulate a process kill (fresh differently-seeded state in a
    'new process'), resume, continue — losses AND final parameters must match
    an uninterrupted 4-step run bit-for-bit. Sampling/dropout randomness is
    keyed by state.step/state.rng, which the checkpoint carries, so exact
    equality (not allclose) is the contract. The reference broke this: its
    fork disabled optimizer/scheduler restore (utils/checkpoint.py:52-94)."""
    cfg = tiny_cfg()
    model = build_detection_model(cfg)
    batch, targets = make_batch(1)
    state0, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                    (batch, targets), "multistep")
    step_fn = make_train_step(model, tx, donate=False)

    # uninterrupted run
    sa, losses_a = state0, []
    for _ in range(4):
        sa, m = step_fn(sa, batch, targets)
        losses_a.append(float(m["loss_total"]))

    # interrupted run: 2 steps -> checkpoint -> "kill"
    sb = state0
    for _ in range(2):
        sb, _ = step_fn(sb, batch, targets)
    Checkpointer(str(tmp_path), max_to_keep=2).save(2, jax.device_get(sb))
    del sb

    # "new process": fresh model/state from a DIFFERENT seed, then resume
    fresh, tx2 = create_train_state(cfg, model, jax.random.PRNGKey(99),
                                    (batch, targets), "multistep")
    restored, it = Checkpointer(str(tmp_path)).resume(jax.device_get(fresh))
    assert it == 2
    step_fn2 = make_train_step(model, tx2, donate=False)
    sc, losses_b = restored, []
    for _ in range(2):
        sc, m = step_fn2(sc, batch, targets)
        losses_b.append(float(m["loss_total"]))

    assert losses_b == losses_a[2:], (losses_a, losses_b)
    assert int(sc.step) == int(sa.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sc.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(sa.opt_state),
                    jax.tree_util.tree_leaves(sc.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
