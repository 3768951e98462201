"""Strip-probe v4: manual deep-pipelined HBM->VMEM DMA for the page stream.

Mosaic's automatic grid pipeline moves the [R, n, n] adjacency at only
~195 GB/s (tile-padded pages: 353 GB/s) vs the 811 GB/s XLA sustains on
the same array.  This probe drives the stream by hand: grid=(1,), the
array stays in HBM (memory_space ANY), and a fori_loop copies pages with a
4-deep ring of make_async_copy buffers, reducing each page after its DMA
completes.  If this recovers XLA-level bandwidth the BCE kernel should own
its DMA; otherwise the page stream is tunnel/hardware-capped.
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
NBUF = 4


def make(pad: bool):
    if pad:
        n1, n2 = 656, 768
        src = jnp.pad(da, ((0, 0), (0, n1 - n), (0, n2 - n)))
    else:
        n1, n2 = n, n
        src = da

    def kernel(hbm_ref, out_ref):
        def body(scratch, sems):
            def get_dma(slot, page):
                return pltpu.make_async_copy(
                    hbm_ref.at[page], scratch.at[slot], sems.at[slot]
                )

            for p in range(NBUF - 1):
                get_dma(p, p).start()

            def loop(p, acc):
                slot = p % NBUF
                nxt = p + NBUF - 1

                @pl.when(nxt < R)
                def _():
                    get_dma(nxt % NBUF, nxt).start()

                get_dma(slot, p).wait()
                return acc + jnp.sum(scratch[slot].astype(jnp.float32))

            out_ref[0, 0] = jax.lax.fori_loop(0, R, loop, jnp.float32(0))

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((NBUF, n1, n2), da.dtype),
            sems=pltpu.SemaphoreType.DMA((NBUF,)),
        )

    fn = jax.jit(lambda d: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(d)[0, 0])
    return fn, src


def slope(fn, x, k1=4, k2=24):
    def go(k):
        acc = jnp.zeros(())
        for i in range(k):
            acc = acc + fn(x) * 1e-12 + acc * 0
        return float(acc)

    go(2)
    t0 = time.perf_counter(); go(k1); t1 = time.perf_counter()
    go(k2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1000


for pad in (True,):
    fn, src = make(pad)
    ms = slope(fn, src)
    print(f"manual dma pad={pad}:  {ms:8.2f} ms -> "
          f"{src.nbytes/1e9/(ms/1e3):6.1f} GB/s", flush=True)
