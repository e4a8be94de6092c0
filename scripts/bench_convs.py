"""Per-shape conv efficiency probe for the R-50 C1-C4 trunk at 608x1216.

Finds which stages run far below MXU peak (v5e bf16 ~197 TFLOP/s).
Each conv repeats REPS times inside one jitted scan (a single relay dispatch
costs ~1-2 ms on this box, which would swamp per-op timings otherwise).

Run ON the TPU: python scripts/bench_convs.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

B = 3
REPS = 32
CASES = [
    # name, (H, W, Cin), Cout, k, stride
    ("stem 7x7 s2 3->64", (608, 1216, 3), 64, 7, 2),
    ("res2 3x3 64", (152, 304, 64), 64, 3, 1),
    ("res2 1x1 64->256", (152, 304, 64), 256, 1, 1),
    ("res3 3x3 128", (76, 152, 128), 128, 3, 1),
    ("res4 3x3 256", (38, 76, 256), 256, 3, 1),
    ("res4 1x1 1024->256", (38, 76, 1024), 256, 1, 1),
    ("res4 1x1 256->1024", (38, 76, 256), 1024, 1, 1),
    ("matmul 8664x1024x256", None, None, 0, 0),
]


def _timeit(f, args, iters=5):
    r = f(*args)
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(r)
    return (time.perf_counter() - t0) / iters


def _bench_repeated(op, x, kern, flops, name):
    def run(x, kern):
        def body(c, _):
            y = op(x * c, kern)
            # data dependency without keeping y alive
            return (jnp.max(jnp.abs(y)) * 0 + 1).astype(x.dtype), None
        c, _ = jax.lax.scan(body, jnp.ones((), x.dtype), None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    jf = jax.jit(run)
    dt = _timeit(jf, (x, kern)) / REPS
    print(f"{name:22s}: {dt * 1e3:6.3f} ms  {flops / dt / 1e12:6.1f} TFLOP/s"
          f"  ({flops / 1e9:6.1f} GFLOP)")


def main():
    print("devices:", jax.devices())
    for name, shape, cout, k, s in CASES:
        if shape is None:
            m, kk, n = 8664, 1024, 256
            x = jnp.zeros((m, kk), jnp.bfloat16)
            w = jnp.zeros((kk, n), jnp.bfloat16)
            _bench_repeated(lambda a, b: a @ b, x, w, 2 * m * kk * n, name)
            continue
        h, w_, cin = shape
        x = jnp.zeros((B, h, w_, cin), jnp.bfloat16)
        kern = jnp.zeros((k, k, cin, cout), jnp.bfloat16)
        pad = ((k // 2, k // 2),) * 2

        def conv(x, kern, s=s, pad=pad):
            return jax.lax.conv_general_dilated(
                x, kern, (s, s), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        out_hw = (h // s) * (w_ // s)
        flops = 2 * B * out_hw * cout * cin * k * k
        _bench_repeated(conv, x, kern, flops, name)


if __name__ == "__main__":
    main()
