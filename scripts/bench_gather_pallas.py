"""Experiment: can a Pallas kernel beat XLA's row-gather for DCN sampling?

Strategy: keep the whole (channel-chunked) feature map VMEM-resident and
gather rows with a vectorized dynamic gather inside the kernel. Whether
Mosaic can lower a vectorized gather (jnp.take / advanced indexing) along
the sublane axis is exactly what this probes — if it only works as a
scalar fori_loop the kernel loses to XLA and we keep the overlapped-row
formulation (scripts/bench_gather.py).

Run:  python scripts/bench_gather_pallas.py     (attached TPU)
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timeit(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def make_gather(s, c, p, pb, mode):
    def kernel(idx_ref, tbl_ref, out_ref):
        idx = idx_ref[:]                      # [pb] int32
        tbl = tbl_ref[:]                      # [s, c]
        if mode == "take":
            out_ref[:] = jnp.take(tbl, idx, axis=0, mode="clip")
        elif mode == "index":
            out_ref[:] = tbl[idx]
        elif mode == "onehot_loop":
            # blocked one-hot matmul: [pb, s] @ [s, c] — FLOPs-heavy but
            # pure MXU; measures the break-even point
            oh = (idx[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (pb, s), 1)).astype(tbl.dtype)
            out_ref[:] = jnp.dot(oh, tbl,
                                 preferred_element_type=jnp.float32
                                 ).astype(out_ref.dtype)
        elif mode == "loop":
            def body(i, _):
                out_ref[pl.ds(i, 1), :] = tbl_ref[pl.ds(idx[i], 1), :]
                return 0
            jax.lax.fori_loop(0, pb, body, 0)

    @jax.jit
    def run(idx, tbl):
        return pl.pallas_call(
            kernel,
            grid=(p // pb,),
            in_specs=[
                pl.BlockSpec((pb,), lambda i: (i,),
                             memory_space=pltpu.SMEM if mode == "loop"
                             else pltpu.VMEM),
                pl.BlockSpec((s, c), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((pb, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((p, c), tbl.dtype),
        )(idx, tbl)

    return run


def make_dma_gather(s, c, p, pb, dtype):
    """Hand-rolled gather engine: table stays in HBM, the kernel issues one
    async row-DMA per output row (start-all / wait-all per [pb, c] block).
    Probes whether explicit DMA issue beats XLA's gather lowering — if row
    issue overhead (~46k rows at res3) dominates, it won't."""

    def kernel(idx_ref, tbl_ref, out_ref, sem):
        blk = pl.program_id(0)

        def issue(i, _):
            r = idx_ref[blk * pb + i]
            pltpu.make_async_copy(tbl_ref.at[pl.ds(r, 1), :],
                                  out_ref.at[pl.ds(i, 1), :], sem).start()
            return 0

        jax.lax.fori_loop(0, pb, issue, 0)

        def drain(i, _):
            # same-size copies: each wait consumes one row's completion
            pltpu.make_async_copy(tbl_ref.at[pl.ds(0, 1), :],
                                  out_ref.at[pl.ds(0, 1), :], sem).wait()
            return 0

        jax.lax.fori_loop(0, pb, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p // pb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((pb, c), lambda i, *_: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )

    @jax.jit
    def run(idx, tbl):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((p, c), dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, tbl)

    return run


def main():
    h, w, c = 76, 152, 512
    s = h * w
    p = s * 4  # 4 corners' worth of rows for one tap... scaled-down probe
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (s, c), dtype)
    idx = jax.random.randint(key, (p,), 0, s, jnp.int32)

    bytes_moved = p * c * 2

    @jax.jit
    def xla_take(idx, tbl):
        return tbl.at[idx].get(mode="promise_in_bounds")

    ref = np.asarray(xla_take(idx, tbl))
    dt = _timeit(xla_take, idx, tbl)
    print(f"xla take        {dt*1e3:7.2f} ms  {bytes_moved/dt/1e9:7.1f} GB/s")

    for pb in (256, 1024):
        try:
            fn = make_dma_gather(s, c, p, pb, dtype)
            got = np.asarray(fn(idx, tbl))
            ok = np.array_equal(got, ref)
            dt = _timeit(fn, idx, tbl)
            print(f"pallas dma-rows     pb={pb:5d} {dt*1e3:7.2f} ms "
                  f"{bytes_moved/dt/1e9:7.1f} GB/s  match={ok}")
        except Exception as e:  # noqa: BLE001 — probing compiler support
            msg = str(e).splitlines()[0][:110]
            print(f"pallas dma-rows     pb={pb:5d} FAILED: {msg}")

    for mode in ("take", "index", "loop"):
        for pb in (512, 2048):
            try:
                fn = make_gather(s, c, p, pb, mode)
                got = np.asarray(fn(idx, tbl))
                ok = np.array_equal(got, ref)
                dt = _timeit(fn, idx, tbl)
                print(f"pallas {mode:12s} pb={pb:5d} {dt*1e3:7.2f} ms "
                      f"{bytes_moved/dt/1e9:7.1f} GB/s  match={ok}")
            except Exception as e:  # noqa: BLE001 — probing compiler support
                msg = str(e).splitlines()[0][:110]
                print(f"pallas {mode:12s} pb={pb:5d} FAILED: {msg}")


if __name__ == "__main__":
    main()
