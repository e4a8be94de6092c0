"""Chip calibration: peak bf16 matmul and HBM bandwidth on the attached TPU.

Establishes the real roofline for this box's relayed v5e before reading
anything into per-op TFLOP/s numbers.
Run ON the TPU: python scripts/bench_roofline.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

REPS = 16


def _timeit(f, args, iters=5):
    r = f(*args)
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(r)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices())

    # peak matmul: 4096^3 bf16
    n = 4096
    a = jnp.zeros((n, n), jnp.bfloat16)
    b = jnp.zeros((n, n), jnp.bfloat16)

    def mm(a, b):
        def body(c, _):
            y = (a * c) @ b
            return (jnp.max(jnp.abs(y)) * 0 + 1).astype(a.dtype), None
        c, _ = jax.lax.scan(body, jnp.ones((), a.dtype), None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    dt = _timeit(jax.jit(mm), (a, b)) / REPS
    print(f"matmul 4096^3 bf16 : {dt * 1e3:7.3f} ms  "
          f"{2 * n ** 3 / dt / 1e12:6.1f} TFLOP/s")

    # HBM bandwidth: elementwise triad on 256 MB
    m = 128 * 1024 * 1024
    x = jnp.zeros((m,), jnp.bfloat16)

    def triad(x):
        def body(c, _):
            y = x * c + jnp.bfloat16(1.0)
            return (jnp.max(y) * 0 + 1).astype(x.dtype), None
        c, _ = jax.lax.scan(body, jnp.ones((), x.dtype), None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    dt = _timeit(jax.jit(triad), (x,)) / REPS
    # read x + write y (+ read y for the max, likely fused) ~ 2 passes
    traffic = 2 * m * 2
    print(f"triad 256MB bf16   : {dt * 1e3:7.3f} ms  "
          f"{traffic / dt / 1e9:6.0f} GB/s (2-pass est)")

    # small matmul from the conv probe for comparison
    mm2, kk, nn = 8664, 1024, 256
    a2 = jnp.zeros((mm2, kk), jnp.bfloat16)
    b2 = jnp.zeros((kk, nn), jnp.bfloat16)

    def small(a, b):
        def body(c, _):
            y = (a * c) @ b
            return (jnp.max(jnp.abs(y)) * 0 + 1).astype(a.dtype), None
        c, _ = jax.lax.scan(body, jnp.ones((), a.dtype), None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    dt = _timeit(jax.jit(small), (a2, b2)) / REPS
    print(f"matmul 8664x1024x256: {dt * 1e3:7.3f} ms  "
          f"{2 * mm2 * kk * nn / dt / 1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
