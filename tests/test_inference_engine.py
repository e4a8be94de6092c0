"""Engine-level inference plumbing tests."""

from da_detect_tpu.engine.inference import _eval_step_for


def test_eval_step_memoized_per_model_and_flags():
    """compute_on_dataset must reuse one jitted eval step per (model,
    flags): a fresh jax.jit per call re-traces and re-loads the executable
    every TTA pass / in-training eval (measured 53.5 -> 2.9 s/img on
    X-101+DCN TTA when this was broken)."""

    class M:  # stand-in; jit wraps lazily, apply is never traced here
        def apply(self, *a, **k):
            raise AssertionError("not traced in this test")

    m1, m2 = M(), M()
    f = _eval_step_for(m1, False, False)
    assert _eval_step_for(m1, False, False) is f
    assert _eval_step_for(m1, True, False) is not f
    assert _eval_step_for(m1, False, True) is not f
    assert _eval_step_for(m2, False, False) is not f
    # same-model lookups stay stable across interleaved other-model use
    assert _eval_step_for(m1, False, False) is f
