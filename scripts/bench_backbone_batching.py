"""Isolate: one batch-3 backbone f+b pass vs three batch-1 passes (one jit).

Explains the train-step delta seen after batching the per-domain passes.
Run ON the TPU: python scripts/bench_backbone_batching.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from da_detect_tpu.models.backbone.resnet import ResNet


def _timeit(f, args, iters=10):
    r = f(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices())
    model = ResNet(depth=50, stages=3, return_all=False, dtype=jnp.bfloat16)
    x3 = jnp.zeros((3, 608, 1216, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x3)

    def fwd_batched(v, x):
        return jnp.sum(model.apply(v, x)[0].astype(jnp.float32))

    def fwd_split(v, x):
        return sum(jnp.sum(model.apply(v, x[i:i + 1])[0].astype(jnp.float32))
                   for i in range(3))

    for name, fn in (("batched[3]", fwd_batched), ("split 3x[1]", fwd_split)):
        g = jax.jit(jax.grad(fn, argnums=1))
        dt = _timeit(g, (variables, x3))
        print(f"f+b {name}: {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
