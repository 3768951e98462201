"""Strip-probe v2: what exactly costs 4.3 us/page in the BCE kernel's
'stream_only' floor?  Variants (all single-page grid, same BlockSpecs):

  dma_only   — load the page, emit one element (no conversion, no reduce)
  sum_bf16   — jnp.sum of the raw bf16 page (no f32 conversion)
  sum_f32    — astype(f32) then sum (the shipped reduction)
  acc_tile   — astype(f32) + reduce into a [8,128] VMEM accumulator output
               (elementwise adds only; scalar reduce happens once outside)
  pages8     — sum_f32 with 8 pages per grid step
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.train.model import make_graph_arrays, preferred_dense_dtype

data = cached_trigraph(load_decagon_raw(), split_rate=0.9, seed=1111)
graph, gs = make_graph_arrays(data, dense_dtype=preferred_dense_dtype(data))
da = graph["dd_adj_t"]
R, n, _ = da.shape


def make(mode, pages=1):
    def kern(da_ref, out_ref):
        i = pl.program_id(0)
        for p in range(pages):
            if mode == "dma_only":
                out_ref[p, 0, 0] = jnp.sum(da_ref[p, 0:8, 0:128].astype(jnp.float32))
            elif mode == "sum_bf16":
                out_ref[p, 0, 0] = jnp.sum(da_ref[p]).astype(jnp.float32)
            else:
                out_ref[p, 0, 0] = jnp.sum(da_ref[p].astype(jnp.float32))

    def kern_acc(da_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        x = da_ref[0].astype(jnp.float32)
        out_ref[...] += jnp.sum(x.reshape(-1, 8, 128), axis=0)

    n_blk = R // pages
    if mode == "acc_tile":
        # n=645 not divisible by 8*128; pad-free trick: reshape needs exact
        # multiple — use [81*6, 8, 128] view of the TILED page? logical
        # reshape of (645, 645) can't hit (8,128) exactly; reduce rows to 8
        # groups instead: sum over axis 0 in 81-row strides then lanes stay.
        def kern_acc2(da_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            x = da_ref[0].astype(jnp.float32)
            out_ref[...] += jnp.sum(x, axis=0, keepdims=True)

        return jax.jit(lambda d: jnp.sum(pl.pallas_call(
            kern_acc2,
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(R,),
                in_specs=[pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, n), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(d)))
    return jax.jit(lambda d: jnp.sum(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_blk * pages, 1, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n_blk,),
            in_specs=[pl.BlockSpec((pages, n, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((pages, 1, 1), lambda i: (i, 0, 0),
                                   memory_space=pltpu.SMEM),
        ),
    )(d)))


def slope(fn, k1=4, k2=24):
    def go(k):
        acc = jnp.zeros(())
        for i in range(k):
            acc = acc + fn(i, acc)
        return float(acc)

    go(2)
    t0 = time.perf_counter(); go(k1); t1 = time.perf_counter()
    go(k2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1000


for mode, pages in (("dma_only", 1), ("sum_bf16", 1), ("sum_f32", 1),
                    ("acc_tile", 1), ("sum_f32", 8)):
    fn = make(mode, pages)
    ms = slope(lambda i, a: fn(da) * 1e-12 + a * 0)
    print(f"{mode:10s} pages={pages}  {ms:8.2f} ms", flush=True)


# --- v3: tile-aligned padded layout probe ------------------------------------
def padded_probe():
    import numpy as np
    n1, n2 = 656, 768  # (16,128)-tile multiples for bf16
    dap = jnp.pad(da, ((0, 0), (0, n1 - n), (0, n2 - n)))

    def kern(da_ref, out_ref):
        out_ref[0, 0, 0] = jnp.sum(da_ref[0].astype(jnp.float32))

    fn = jax.jit(lambda d: jnp.sum(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, 1, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(R,),
            in_specs=[pl.BlockSpec((1, n1, n2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                   memory_space=pltpu.SMEM),
        ),
    )(d)))
    ms = slope(lambda i, a: fn(dap) * 1e-12 + a * 0)
    gbs = dap.nbytes / 1e9 / (ms / 1e3)
    print(f"padded sum_f32 [R,656,768]   {ms:8.2f} ms -> {gbs:6.1f} GB/s",
          flush=True)


padded_probe()
