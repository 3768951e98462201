"""A/B benchmark of the negative-edge decoder paths at Decagon scale.

VERDICT round-2 item 3: the chunked one-hot SDDMM is ~80% of modeled step
FLOPs at ~40x the ideal per-edge work; measure the alternatives under the
dense-RGCN config and make the fastest the default.

Variants measured (fwd and fwd+bwd, chained-iteration slope timing):
  * pallas_v1 — ops/pallas_segment.py:distmult_logits_padded (one-hot over
    the full 645-node axis: 6 MXU K-tiles, 16/128 lanes)
  * pallas_v2 — ops/pallas_sddmm2.py:distmult_logits_padded2 (two-level
    gather: single-tile matmul + VPU hi-select)
  * xla_gather — jnp row gathers + elementwise reduce (decoders.py XLA path)

Also times the Pallas sampler and the dense positive-BCE term for the
per-component picture.  Writes runs/decoder_ab_<dtype>.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tip_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from tip_tpu.config import ModelConfig
from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.nn.decoders import distmult_dense_pos_bce_sum, distmult_init
from tip_tpu.ops.pallas_segment import distmult_logits_padded
from tip_tpu.ops.pallas_sddmm2 import distmult_logits_padded2
from tip_tpu.sampling import typed_negative_sampling_chunked
from tip_tpu.train.model import TIP, make_graph_arrays

kd = sys.argv[1] if len(sys.argv) > 1 else "float32"
cdt = jnp.dtype(kd)

raw = load_decagon_raw()
data = cached_trigraph(raw, split_rate=0.9, seed=1111)
graph, gs = make_graph_arrays(data, dense_dtype=kd)
model = TIP.for_data(ModelConfig.tip_cat(kernel_dtype=kd), data, gs, backend="auto")
params = model.init(jax.random.key(0))
z0 = jax.jit(model.encode)(params, graph)
w0 = params["decoder"]["weight"]
src2d, dst2d, ct = graph["dd_src2d"], graph["dd_dst2d"], graph["dd_chunk_type"]
valid = graph["dd_valid"]
n = gs.n_drug
print(f"n_chunks={gs.dd_n_chunks} chunk={gs.dd_chunk} dtype={kd}", file=sys.stderr)


def slope(fn, k1=4, k2=16):
    def run(k):
        acc = jnp.zeros(())
        for i in range(k):
            acc = acc + fn(i, acc)
        return float(acc)

    run(2)
    t0 = time.perf_counter(); run(k1); t1 = time.perf_counter()
    run(k2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1000


def v1(z, w):
    return distmult_logits_padded(z, w, src2d, dst2d, ct, cdt)


def v2(z, w):
    return distmult_logits_padded2(z, w, src2d, dst2d, ct, n, cdt)


def xla_gather(z, w):
    chunk = src2d.shape[1]
    src = src2d.reshape(-1)
    dst = jnp.minimum(dst2d.reshape(-1), z.shape[0] - 1)
    et = jnp.repeat(ct, chunk)
    return jnp.sum(z[src] * z[dst] * w[et], axis=-1).reshape(src2d.shape)


results = {}
for name, fn in [("pallas_v1", v1), ("pallas_v2", v2), ("xla_gather", xla_gather)]:
    fwd = jax.jit(lambda z, w, a, fn=fn: jnp.sum(
        jax.nn.softplus(fn(z + a * 0, w).reshape(-1)) * valid))
    t_f = slope(lambda i, a: fwd(z0, w0, a))

    def loss(zw, a, fn=fn):
        z, w = zw
        return jnp.sum(jax.nn.softplus(fn(z + a * 0, w).reshape(-1)) * valid)

    # fold the grads into the scalar so the backward pass isn't dead code
    g = jax.jit(lambda z, w, a, loss=loss: (
        lambda v, gr: v + 1e-20 * (jnp.sum(gr[0]) + jnp.sum(gr[1]))
    )(*jax.value_and_grad(loss)((z, w), a)))
    t_fb = slope(lambda i, a: g(z0, w0, a))
    results[name] = {"fwd_ms": round(t_f, 2), "fwd_bwd_ms": round(t_fb, 2)}
    print(f"{name:12s} fwd {t_f:8.2f} ms   fwd+bwd {t_fb:8.2f} ms", file=sys.stderr)

# value cross-check (masked sums agree)
ref = float(jnp.sum(jax.nn.softplus(v1(z0, w0).reshape(-1)) * valid))
for name, fn in [("pallas_v2", v2), ("xla_gather", xla_gather)]:
    val = float(jnp.sum(jax.nn.softplus(fn(z0, w0).reshape(-1)) * valid))
    results[name]["rel_err_vs_v1"] = abs(val - ref) / abs(ref)
    print(f"{name} value rel err vs v1: {results[name]['rel_err_vs_v1']:.2e}",
          file=sys.stderr)

# sampler
samp = jax.jit(lambda k: typed_negative_sampling_chunked(
    k, ct, graph["dd_bitmap"], gs.n_drug, gs.n_et, gs.dd_chunk,
    backend=model.backend, planes=graph.get("dd_bitmap_planes")))
t = slope(lambda i, a: jnp.sum(samp(
    jax.random.fold_in(jax.random.key(7), i + jnp.int32(a * 0)))[0]) * 1e-12)
results["sampler"] = {"ms": round(t, 2)}
print(f"sampler      {t:8.2f} ms", file=sys.stderr)

# dense positive BCE term (fwd and fwd+bwd); the adjacency must be a jit
# ARGUMENT — closed over, it becomes a >1 GB inline constant that overflows
# the axon remote-compile request limit
da = graph["dd_adj_t"]
posf = jax.jit(lambda z, w, da, a: distmult_dense_pos_bce_sum(w, z + a * 0, da, kd))
t_f = slope(lambda i, a: posf(z0, w0, da, a) * 1e-9)
posg = jax.jit(lambda z, w, da, a: (
    lambda v, gr: v * 1e-9 + 1e-20 * (jnp.sum(gr[0]) + jnp.sum(gr[1]))
)(*jax.value_and_grad(
    lambda zw: distmult_dense_pos_bce_sum(zw[1], zw[0] + a * 0, da, kd))((z, w))))
t_fb = slope(lambda i, a: posg(z0, w0, da, a))
results["dense_pos_bce"] = {"fwd_ms": round(t_f, 2), "fwd_bwd_ms": round(t_fb, 2)}
print(f"dense_pos    fwd {t_f:8.2f} ms   fwd+bwd {t_fb:8.2f} ms", file=sys.stderr)

out = f"runs/decoder_ab_{kd}.json"
with open(out, "w") as f:
    json.dump({"dtype": kd, "n_chunks": gs.dd_n_chunks, **results}, f, indent=1)
print(json.dumps(results))
