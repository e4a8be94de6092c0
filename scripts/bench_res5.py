"""Micro-benchmark: res5 ROI-head formulations on the attached TPU chip.

The C4 box head (res5 on [N_roi, 14, 14, 1024] -> [N_roi, 7, 7, 2048])
dominates the DA train step (~20 ms of 41 ms, see PERFORMANCE.md). This
compares:

  A. flax/lax conv stack (what models/backbone/resnet.py::ResNetHead does)
  B. explicit im2col matmul (3x3 conv as one [N*49, 9C] x [9C, Co] GEMM)
  C. shift-accumulate (3x3 conv as nine [N*49, C] x [C, Co] GEMMs)

forward-only and forward+backward, bf16, honest host-fetch barrier
(block_until_ready acks early over the axon relay — TROUBLESHOOTING.md).

Run ON the TPU (not via scripts/test.sh): python scripts/bench_res5.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 512          # ROIs across the two domain passes of the parity step
DTYPE = jnp.bfloat16


def _timeit(f, args, iters=20):
    r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _params(key):
    """res5 = 3 bottlenecks: (1024->512 s2, 512x3x3, 512->2048) + ds, then
    (2048->512, 512x3x3, 512->2048) x2. FrozenBN folded to per-channel
    scale/bias."""
    ks = jax.random.split(key, 32)
    i = iter(range(32))
    p = {}

    def w(shape):
        return (jax.random.normal(ks[next(i)], shape, jnp.float32)
                * 0.02).astype(DTYPE)

    p["ds_w"] = w((1024, 2048))
    for b in range(3):
        cin = 1024 if b == 0 else 2048
        p[f"b{b}_w1"] = w((cin, 512))
        p[f"b{b}_w2"] = w((3, 3, 512, 512))
        p[f"b{b}_w3"] = w((512, 2048))
        for j in (1, 2, 3):
            p[f"b{b}_s{j}"] = jnp.ones((512 if j < 3 else 2048,), DTYPE)
            p[f"b{b}_o{j}"] = jnp.zeros((512 if j < 3 else 2048,), DTYPE)
    p["ds_s"] = jnp.ones((2048,), DTYPE)
    p["ds_o"] = jnp.zeros((2048,), DTYPE)
    return p


def _affine(x, s, o):
    return x * s + o


# --- variant A: lax conv ----------------------------------------------------

def _conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def head_conv(p, x):
    # block0: stride-2 in the 1x1 (Caffe2), downsample shortcut
    sc = _affine(jnp.einsum("bhwc,co->bhwo", x[:, ::2, ::2], p["ds_w"]),
                 p["ds_s"], p["ds_o"])
    h = jax.nn.relu(_affine(
        jnp.einsum("bhwc,co->bhwo", x[:, ::2, ::2], p["b0_w1"]),
        p["b0_s1"], p["b0_o1"]))
    h = jax.nn.relu(_affine(_conv(h, p["b0_w2"]), p["b0_s2"], p["b0_o2"]))
    h = _affine(jnp.einsum("bhwc,co->bhwo", h, p["b0_w3"]),
                p["b0_s3"], p["b0_o3"])
    x = jax.nn.relu(h + sc)
    for b in (1, 2):
        h = jax.nn.relu(_affine(
            jnp.einsum("bhwc,co->bhwo", x, p[f"b{b}_w1"]),
            p[f"b{b}_s1"], p[f"b{b}_o1"]))
        h = jax.nn.relu(_affine(_conv(h, p[f"b{b}_w2"]),
                                p[f"b{b}_s2"], p[f"b{b}_o2"]))
        h = _affine(jnp.einsum("bhwc,co->bhwo", h, p[f"b{b}_w3"]),
                    p[f"b{b}_s3"], p[f"b{b}_o3"])
        x = jax.nn.relu(h + x)
    return x


# --- variant B: im2col ------------------------------------------------------

def _conv3x3_im2col(x, w):
    n, hh, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + hh, dx:dx + ww, :]
         for dy in range(3) for dx in range(3)], axis=-1)   # [n,h,w,9c]
    return jnp.einsum("bhwk,ko->bhwo", cols, w.reshape(9 * c, -1))


# --- variant C: shift-accumulate ---------------------------------------------

def _conv3x3_shift(x, w):
    n, hh, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            t = jnp.einsum("bhwc,co->bhwo", xp[:, dy:dy + hh, dx:dx + ww],
                           w[dy, dx])
            out = t if out is None else out + t
    return out


def _head_mm(conv3, p, x):
    sc = _affine(jnp.einsum("bhwc,co->bhwo", x[:, ::2, ::2], p["ds_w"]),
                 p["ds_s"], p["ds_o"])
    h = jax.nn.relu(_affine(
        jnp.einsum("bhwc,co->bhwo", x[:, ::2, ::2], p["b0_w1"]),
        p["b0_s1"], p["b0_o1"]))
    h = jax.nn.relu(_affine(conv3(h, p["b0_w2"]), p["b0_s2"], p["b0_o2"]))
    h = _affine(jnp.einsum("bhwc,co->bhwo", h, p["b0_w3"]),
                p["b0_s3"], p["b0_o3"])
    x = jax.nn.relu(h + sc)
    for b in (1, 2):
        h = jax.nn.relu(_affine(
            jnp.einsum("bhwc,co->bhwo", x, p[f"b{b}_w1"]),
            p[f"b{b}_s1"], p[f"b{b}_o1"]))
        h = jax.nn.relu(_affine(conv3(h, p[f"b{b}_w2"]),
                                p[f"b{b}_s2"], p[f"b{b}_o2"]))
        h = _affine(jnp.einsum("bhwc,co->bhwo", h, p[f"b{b}_w3"]),
                    p[f"b{b}_s3"], p[f"b{b}_o3"])
        x = jax.nn.relu(h + x)
    return x


# --- variants D/E: custom_vjp hybrids (shift fwd + hand-written bwd) ---------

def _shift_bwd_dx(g, w):
    """dx = correlation of g with the 180-degree-rotated, IO-swapped kernel,
    in the same shift-matmul form."""
    return _conv3x3_shift(g, jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2))


def _shift_bwd_dw(x, g):
    n, hh, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for dy in range(3):
        for dx in range(3):
            rows.append(jnp.einsum("bhwc,bhwo->co",
                                   xp[:, dy:dy + hh, dx:dx + ww], g))
    return jnp.stack(rows, 0).reshape(3, 3, c, -1)


@jax.custom_vjp
def _conv3x3_hybrid(x, w):
    return _conv3x3_shift(x, w)


def _hy_fwd(x, w):
    return _conv3x3_shift(x, w), (x, w)


def _hy_bwd(res, g):
    x, w = res
    return _shift_bwd_dx(g, w), _shift_bwd_dw(x, g)


_conv3x3_hybrid.defvjp(_hy_fwd, _hy_bwd)


@jax.custom_vjp
def _conv3x3_hybrid_laxbwd(x, w):
    return _conv3x3_shift(x, w)


def _hyl_fwd(x, w):
    return _conv3x3_shift(x, w), (x, w)


def _hyl_bwd(res, g):
    x, w = res
    dx = jax.lax.conv_general_dilated(
        g, jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dw = _shift_bwd_dw(x, g)
    return dx, dw


_conv3x3_hybrid_laxbwd.defvjp(_hyl_fwd, _hyl_bwd)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    p = _params(key)
    x = (jax.random.normal(jax.random.PRNGKey(1), (B, 14, 14, 1024),
                           jnp.float32) * 0.1).astype(DTYPE)

    variants = {
        "A_laxconv": head_conv,
        "B_im2col": lambda p, x: _head_mm(_conv3x3_im2col, p, x),
        "C_shift": lambda p, x: _head_mm(_conv3x3_shift, p, x),
        "D_hybrid": lambda p, x: _head_mm(_conv3x3_hybrid, p, x),
        "E_hyblax": lambda p, x: _head_mm(_conv3x3_hybrid_laxbwd, p, x),
    }

    # numerics cross-check (vs A, f32 tolerance for bf16 compute)
    ref = np.asarray(head_conv(p, x), np.float32)
    for name, fn in variants.items():
        got = np.asarray(fn(p, x), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)
        print(f"{name}: rel err vs A = {err:.2e}")

    # FLOPs for context
    flops = B * 1.46e9
    for name, fn in variants.items():
        jf = jax.jit(fn)
        dt = _timeit(jf, (p, x))
        print(f"fwd  {name}: {dt * 1e3:7.2f} ms  "
              f"({flops / dt / 1e12:5.1f} TFLOP/s)")

    def make_fb(fn):
        def loss(p, x):
            return jnp.sum(fn(p, x).astype(jnp.float32))
        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        return g

    for name, fn in variants.items():
        dt = _timeit(make_fb(fn), (p, x))
        print(f"f+b  {name}: {dt * 1e3:7.2f} ms  "
              f"({3 * flops / dt / 1e12:5.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
