import jax
import jax.numpy as jnp
import numpy as np
import torch

from da_detect_tpu.config import get_cfg
from da_detect_tpu.solver.optim import detectron_sgd, param_labels
from da_detect_tpu.solver.schedules import warmup_cosine, warmup_multistep


def test_warmup_multistep_values():
    s = warmup_multistep(0.01, steps=(8, 12), gamma=0.1, warmup_factor=1 / 3,
                         warmup_iters=4, warmup_method="linear")
    # warmup: factor goes 1/3 -> 1 linearly
    np.testing.assert_allclose(float(s(0)), 0.01 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(s(4)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(s(9)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(s(13)), 0.0001, rtol=1e-6)


def test_warmup_cosine_matches_timm_formula():
    base, lr_min, w0, wt, tmax = 0.001, 1e-6, 1e-4, 10, 100
    s = warmup_cosine(base, tmax, lr_min, w0, wt)
    np.testing.assert_allclose(float(s(0)), w0, rtol=1e-6)
    np.testing.assert_allclose(float(s(5)), w0 + 5 * (base - w0) / wt, rtol=1e-6)
    # timm CosineLRScheduler (warmup_prefix=False): t counts from 0
    t = 50
    want = lr_min + 0.5 * (base - lr_min) * (1 + np.cos(np.pi * t / tmax))
    np.testing.assert_allclose(float(s(t)), want, rtol=1e-6)
    np.testing.assert_allclose(float(s(tmax)), lr_min, rtol=1e-4, atol=1e-9)


def test_sgd_matches_torch():
    """Our SGD+momentum+wd must match torch.optim.SGD trajectories, incl. the
    Detectron bias rules (2x lr, no wd)."""
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    b0 = rng.randn(3).astype(np.float32)
    params = {"layer": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    labels = {"layer": {"kernel": "weight", "bias": "bias"}}
    lr, mom, wd = 0.02, 0.9, 0.0005
    tx = detectron_sgd(lambda step: lr, mom, wd, 0.0, 2.0, labels)
    opt_state = tx.init(params)

    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    topt = torch.optim.SGD([
        {"params": [tw], "lr": lr, "weight_decay": wd},
        {"params": [tb], "lr": lr * 2, "weight_decay": 0.0},
    ], momentum=mom)

    for i in range(5):
        g_w = rng.randn(4, 3).astype(np.float32)
        g_b = rng.randn(3).astype(np.float32)
        grads = {"layer": {"kernel": jnp.asarray(g_w), "bias": jnp.asarray(g_b)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        topt.zero_grad()
        tw.grad = torch.tensor(g_w)
        tb.grad = torch.tensor(g_b)
        topt.step()
    np.testing.assert_allclose(np.asarray(params["layer"]["kernel"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layer"]["bias"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_cosine_bias_group_semantics():
    """Under the cosine schedule biases must follow timm's per-group rule
    (reference triplet trainer, train_net_triplet.py:66-81): every group
    warms up from the SAME warmup_lr_init and anneals to the SAME lr_min;
    only the group's base lr (2x for biases) is scaled. A multiplicative
    2 x schedule(t) would double the warmup floor and lr_min too."""
    from da_detect_tpu.solver.optim import make_optimizer

    cfg = get_cfg()
    s = cfg.SOLVER
    s.BASE_LR, s.LR_MIN, s.WARMUP_LR, s.WARMUP_ITERS = 0.001, 1e-6, 1e-4, 4
    s.MAX_ITER, s.MOMENTUM = 20, 0.0
    s.WEIGHT_DECAY = s.WEIGHT_DECAY_BIAS = 0.0
    s.BIAS_LR_FACTOR = 2.0
    params = {"layer": {"kernel": jnp.zeros((2,)), "bias": jnp.zeros((2,))}}
    tx, _ = make_optimizer(cfg, params, "cosine")
    opt = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)

    def lrs(updates):
        return (-float(updates["layer"]["kernel"][0]),
                -float(updates["layer"]["bias"][0]))

    # t=0 (warmup start): both groups at warmup_lr_init — NOT 2x for bias
    upd, opt = tx.update(g, opt, params)
    w_lr, b_lr = lrs(upd)
    np.testing.assert_allclose(w_lr, 1e-4, rtol=1e-6)
    np.testing.assert_allclose(b_lr, 1e-4, rtol=1e-6)
    # t=2 (mid-warmup): linear from shared w0 to each group's base
    upd, opt = tx.update(g, opt, params)  # t=1
    upd, opt = tx.update(g, opt, params)  # t=2
    w_lr, b_lr = lrs(upd)
    np.testing.assert_allclose(w_lr, 1e-4 + 2 * (0.001 - 1e-4) / 4, rtol=1e-6)
    np.testing.assert_allclose(b_lr, 1e-4 + 2 * (0.002 - 1e-4) / 4, rtol=1e-6)
    # cosine phase: lr_min shared, base per-group
    for _ in range(8):  # t -> 10
        upd, opt = tx.update(g, opt, params)
    w_lr, b_lr = lrs(upd)
    t, tmax = 10, 20
    cos = 0.5 * (1 + np.cos(np.pi * t / tmax))
    np.testing.assert_allclose(w_lr, 1e-6 + (0.001 - 1e-6) * cos, rtol=1e-5)
    np.testing.assert_allclose(b_lr, 1e-6 + (0.002 - 1e-6) * cos, rtol=1e-5)


def test_param_labels_freezing():
    params = {
        "backbone": {"body": {
            "stem": {"conv1": {"kernel": jnp.zeros((1,))}},
            "layer1": {"block0": {"conv1": {"kernel": jnp.zeros((1,))}}},
            "layer2": {"block0": {"conv1": {"kernel": jnp.zeros((1,)),
                                            "bias": jnp.zeros((1,))}}},
        }},
        "predictor": {"cls_score": {"kernel": jnp.zeros((1,)),
                                    "bias": jnp.zeros((1,))}},
    }
    labels = param_labels(params, freeze_at=2)
    assert labels["backbone"]["body"]["stem"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["body"]["layer1"]["block0"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["body"]["layer2"]["block0"]["conv1"]["kernel"] == "weight"
    assert labels["backbone"]["body"]["layer2"]["block0"]["conv1"]["bias"] == "bias"
    assert labels["predictor"]["cls_score"]["bias"] == "bias"

    # frozen params receive zero updates
    tx = detectron_sgd(lambda s: 0.1, 0.9, 1e-4, 0.0, 2.0, labels)
    opt = tx.init(params)
    ones = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), params)
    updates, _ = tx.update(ones, opt, params)
    assert float(jnp.sum(jnp.abs(
        updates["backbone"]["body"]["stem"]["conv1"]["kernel"]))) == 0.0
    assert float(jnp.sum(jnp.abs(
        updates["predictor"]["cls_score"]["kernel"]))) > 0.0
