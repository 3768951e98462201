"""Strip-probe the fused dense BCE kernel: what bounds its 6.6 ms forward?

Times kernel VARIANTS with pieces removed (same grid/BlockSpecs/page
streaming) on the real chip:
  full        — the shipped forward math
  no_prng     — counts replaced by a constant mask (drops PRNG + compares)
  no_softplus — softplus replaced by abs (drops transcendentals)
  dot_only    — logits matmul + reduce only (drops all elementwise extras)
  stream_only — da page reduce only (pure DMA+reduce floor)

The deltas attribute the budget among DMA, MXU (d=16 logits dot), VPU
arithmetic, PRNG, and transcendentals — the decision input for the next
optimization (e.g. symmetric-half evaluation).  Mosaic lesson from the
sampler: measure before optimizing, layout/ops attribution is never
obvious (runs/probe_sampler*.out).
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
qq = graph["dd_neg_q"]
R, n, _ = da.shape
d = 16
key = jax.random.key(0)
w = jax.random.normal(key, (R, d)) * 0.3
z = jax.random.normal(jax.random.key(1), (n, d)) * 0.5


def variant(mode):
    def kern(n, seed_ref, q_ref, w_ref, zt_ref, da_ref, z_ref, out_ref):
        t = pl.program_id(0)
        da_t = da_ref[0].astype(jnp.float32)
        if mode == "stream_only":
            out_ref[0, 0, 0] = jnp.sum(da_t)
            return
        zz = z_ref[...]
        logits = jnp.dot(zz * w_ref[0], zt_ref[...],
                         preferred_element_type=jnp.float32)
        if mode == "dot_only":
            out_ref[0, 0, 0] = jnp.sum(logits * da_t)
            return
        if mode == "no_softplus":
            sp = jnp.abs(logits)
        else:
            sp = jax.nn.softplus(-logits)
        if mode == "no_prng":
            cnt = jnp.where(da_t > 0, 0.0, 0.02)
        else:
            pltpu.prng_seed(seed_ref[0], t)
            u24 = jax.lax.shift_right_logical(
                pltpu.bitcast(pltpu.prng_random_bits((n, n)), jnp.int32), 8
            )
            cnt = jnp.zeros(u24.shape, jnp.float32)
            for k in range(3):
                cnt = cnt + (u24 < q_ref[3 * t + k]).astype(jnp.float32)
            cnt = jnp.where(da_t > 0, jnp.float32(0), cnt)
        out_ref[0, 0, 0] = jnp.sum(sp * da_t + (sp + logits) * cnt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda t, *sp: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n), lambda t, *sp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda t, *sp: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda t, *sp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda t, *sp: (t, 0, 0),
                               memory_space=pltpu.SMEM),
    )

    def run(w_, z_, da_, q_, seed_arr):
        out = pl.pallas_call(
            functools.partial(kern, n),
            out_shape=jax.ShapeDtypeStruct((R, 1, 1), jnp.float32),
            grid_spec=grid_spec,
        )(seed_arr, q_.reshape(-1), w_.astype(jnp.float32)[:, None, :],
          z_.astype(jnp.float32).T, da_, z_.astype(jnp.float32))
        return jnp.sum(out)

    return jax.jit(run)


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


for mode in ("stream_only", "dot_only", "no_prng", "no_softplus", "full"):
    fn = variant(mode)
    seed_arr = jnp.zeros((1,), jnp.int32)
    ms = slope(lambda i, a: fn(w + a * 0, z, da, qq, seed_arr) * 1e-9)
    print(f"{mode:12s} {ms:8.2f} ms", flush=True)
