"""Microbenchmark: DCN corner-gather strategies on the attached TPU.

The DCN hot loop gathers 4 bilinear corner rows per (output pixel, tap) from
the flattened feature map. Round-2 measurements pinned XLA's row-gather at
~35-55 GB/s on v5e (15x under HBM peak) and found four separate
promise_in_bounds takes beat one combined take. This script asks the next
question: is the gather *row-issue-bound*? If so, gathering FEWER, WIDER
rows at the same total bytes should scale throughput:

- base:   4 takes of [P] rows from [N, C]        (shipped lowering)
- pair:   2 takes of [P] rows from [N-1, 2C] overlapped x-pairs
          (corners (y,x0) and (y,x0+1) are adjacent in row-major memory)
- quad:   1 take of [P] rows from [N-w-1, 4C] overlapped (x-pair, y-pair)
          rows (corner rows y0 and y0+1 are w apart)

The overlapped tables cost one streamed materialization each (HBM-peak
copy, amortized over 9 taps x 4 corners of gathers) and 2x/4x fmap HBM --
trivial next to the activation budget.

OUTCOME (measured 2026-08-18, post libtpu upgrade): forward-only the three
modes are within 10% (base 2.97 ms / pair 3.41 / quad 3.10, ~125-143 GB/s
-- the runtime upgrade lifted row-gather well above the 35-55 GB/s that
motivated this experiment), but fwd+bwd base wins big (14.9 vs 19.4/20.4
ms): the overlapped tables' backward scatters into the 2x/4x-wide table
and then reduces it. End-to-end X-101+DCN train step: four 767.8 ms vs
quad 1302.5 ms. `TPU.DCN_GATHER` stays "four".

Run:  python scripts/bench_gather.py            (attached TPU)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.tree.map(lambda x: x.addressable_data(0), out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # honest barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


def main():
    # res3-of-X-101 train shapes: canvas 608x1216 stride 8
    h, w, c = 76, 152, 512
    taps = 9
    n = h * w
    p = n  # one sample point per output pixel per tap
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    fmap = jax.random.normal(key, (n, c), dtype)
    # plausible DCN sample coords: base grid + small offsets
    ys = jnp.clip(jax.random.normal(key, (p, taps)) * 2
                  + jnp.arange(h).repeat(w)[:, None], 0, h - 1)
    xs = jnp.clip(jax.random.normal(key, (p, taps)) * 2
                  + jnp.tile(jnp.arange(w), h)[:, None], 0, w - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.clip(y0, 0, h - 2)
    x0 = jnp.clip(x0, 0, w - 2)
    wy = (ys - y0).astype(dtype)
    wx = (xs - x0).astype(dtype)

    bytes_total = p * taps * 4 * c * np.dtype(np.float32).itemsize // 2  # bf16

    @jax.jit
    def base(fmap, y0, x0, wy, wx):
        idx00 = y0 * w + x0
        acc = jnp.zeros((p, c), jnp.float32)
        for t in range(taps):
            i = idx00[:, t]
            v00 = fmap.at[i].get(mode="promise_in_bounds")
            v01 = fmap.at[i + 1].get(mode="promise_in_bounds")
            v10 = fmap.at[i + w].get(mode="promise_in_bounds")
            v11 = fmap.at[i + w + 1].get(mode="promise_in_bounds")
            ly, lx = wy[:, t, None], wx[:, t, None]
            samp = ((1 - ly) * (1 - lx) * v00 + (1 - ly) * lx * v01
                    + ly * (1 - lx) * v10 + ly * lx * v11)
            acc = acc + samp.astype(jnp.float32)
        return acc

    @jax.jit
    def pair(fmap, y0, x0, wy, wx):
        # overlapped x-pairs: flat2[i] = [fmap[i], fmap[i+1]]
        flat2 = jnp.concatenate([fmap[:-1], fmap[1:]], axis=-1)  # [n-1, 2c]
        idx00 = y0 * w + x0
        acc = jnp.zeros((p, c), jnp.float32)
        for t in range(taps):
            i = idx00[:, t]
            r0 = flat2.at[i].get(mode="promise_in_bounds").reshape(p, 2, c)
            r1 = flat2.at[i + w].get(mode="promise_in_bounds").reshape(p, 2, c)
            ly, lx = wy[:, t, None], wx[:, t, None]
            top = (1 - lx) * r0[:, 0] + lx * r0[:, 1]
            bot = (1 - lx) * r1[:, 0] + lx * r1[:, 1]
            acc = acc + ((1 - ly) * top + ly * bot).astype(jnp.float32)
        return acc

    @jax.jit
    def quad(fmap, y0, x0, wy, wx):
        # overlapped (x-pair, y-pair): flat4[i] = [f[i], f[i+1], f[i+w], f[i+w+1]]
        flat2 = jnp.concatenate([fmap[:-1], fmap[1:]], axis=-1)
        flat4 = jnp.concatenate([flat2[:-w], flat2[w:]], axis=-1)  # [n-w-1, 4c]
        idx00 = y0 * w + x0
        acc = jnp.zeros((p, c), jnp.float32)
        for t in range(taps):
            i = idx00[:, t]
            r = flat4.at[i].get(mode="promise_in_bounds").reshape(p, 4, c)
            ly, lx = wy[:, t, None], wx[:, t, None]
            top = (1 - lx) * r[:, 0] + lx * r[:, 1]
            bot = (1 - lx) * r[:, 2] + lx * r[:, 3]
            acc = acc + ((1 - ly) * top + ly * bot).astype(jnp.float32)
        return acc

    ref = np.asarray(base(fmap, y0, x0, wy, wx))
    for name, fn in (("base", base), ("pair", pair), ("quad", quad)):
        got = np.asarray(fn(fmap, y0, x0, wy, wx))
        err = np.abs(got - ref).max()
        dt = _timeit(fn, fmap, y0, x0, wy, wx)
        print(f"fwd  {name:5s} {dt*1e3:7.2f} ms  {bytes_total/dt/1e9:7.1f} GB/s"
              f"  maxerr={err:.2e}")

    # fwd+bwd (grad wrt fmap exercises the scatter transpose too)
    for name, fn in (("base", base), ("pair", pair), ("quad", quad)):
        g = jax.jit(jax.grad(lambda f: jnp.sum(fn(f, y0, x0, wy, wx) ** 2)))
        dt = _timeit(g, fmap)
        print(f"f+b  {name:5s} {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
