"""Round-4 roofline probe, part 2: CORRECT fwd+bwd timings.

Part 1's grad probes dropped the gradient output, so XLA dead-code
eliminated the whole backward (the axon pitfall); also every big buffer
must be a jit ARGUMENT, not a closure constant — closure constants ride
the remote-compile payload and trip HTTP 413 on the tunnel.

Usage: python scripts/roofline_probe2.py [float32] > runs/roofline_probe2_f32.out
"""
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
from tip_tpu.train.model import TIP, make_graph_arrays, preferred_dense_dtype

kd = sys.argv[1] if len(sys.argv) > 1 else "float32"
data = cached_trigraph(load_decagon_raw(), split_rate=0.9, seed=1111)
graph, gs = make_graph_arrays(data, dense_dtype=preferred_dense_dtype(data, kd))
cfg = ModelConfig.tip_cat(kernel_dtype=kd)
model = TIP.for_data(cfg, data, gs, backend="auto")
params = model.init(jax.random.key(0))
print(f"backend={model.backend} kernel_dtype={kd}", flush=True)


def slope(fn, k1=4, k2=24):
    def run(k):
        acc = jnp.zeros(())
        for i in range(k):
            acc = acc + fn(i, acc)
        return float(acc)

    run(2)
    t0 = time.perf_counter(); run(k1); t1 = time.perf_counter()
    run(k2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1000


def report(name, ms):
    print(f"{name:36s} {ms:8.2f} ms", flush=True)


def fold(v, gr):
    return v + 1e-20 * sum(jnp.sum(x) for x in jax.tree.leaves(gr))


da = graph["dd_adj_t"]
w = params["decoder"]["weight"]
z0 = jax.jit(model.encode)(params, graph)

from tip_tpu.nn.decoders import distmult_dense_pos_bce_sum

posg = jax.jit(lambda w, z, d, a: fold(*jax.value_and_grad(
    lambda wz: distmult_dense_pos_bce_sum(
        wz[0], wz[1], d, kernel_dtype=kd) * 1e-9)((w + a * 0, z))))
report("pos BCE fwd+bwd (real)", slope(lambda i, a: posg(w, z0, da, a)))

from tip_tpu.sampling import typed_negative_sampling_chunked

samp = jax.jit(lambda k, g: typed_negative_sampling_chunked(
    k, g["dd_chunk_type"], g["dd_bitmap"], gs.n_drug, gs.n_et, gs.dd_chunk,
    backend=model.backend, planes=g.get("dd_bitmap_planes")))
sneg, dneg = samp(jax.random.key(3), graph)
sneg = jnp.asarray(sneg); dneg = jnp.asarray(dneg)

negg = jax.jit(lambda p, z, s, d, ct, a: fold(*jax.value_and_grad(
    lambda wz: jnp.sum(model.score_padded(
        {"decoder": {"weight": wz[0]}}, wz[1], s, d, ct,
        sigmoid=False)) * 1e-9)((p, z + a * 0))))
report("neg SDDMM fwd+bwd (real)", slope(
    lambda i, a: negg(w, z0, sneg, dneg, graph["dd_chunk_type"], a)))

# P-P dense encoder, fwd and fwd+bwd
from tip_tpu.nn.encoders import pp_encoder_apply_dense

wp = params["encoder"]["pp"]
ppf = jax.jit(lambda p, a1, di, a: jnp.sum(pp_encoder_apply_dense(
    jax.tree.map(lambda x: x + a * 0, p), None, a1, di)))
report("pp dense 2-layer fwd", slope(
    lambda i, a: ppf(wp, graph["pp_a1"], graph["pp_dinv"], a)))
ppg = jax.jit(lambda p, a1, di, a: fold(*jax.value_and_grad(
    lambda q: jnp.sum(pp_encoder_apply_dense(q, None, a1, di)))(
    jax.tree.map(lambda x: x + a * 0, p))))
report("pp dense 2-layer fwd+bwd", slope(
    lambda i, a: ppg(wp, graph["pp_a1"], graph["pp_dinv"], a)))

# R-GCN dense pair OLD form (per-layer dense branch) vs NEW M-first pair
from tip_tpu.nn.rgcn import dense_rgcn_pair_apply, rgcn_apply_padded

enc = params["encoder"]
xin = jnp.ones((gs.n_drug, 64), jnp.float32)
def rgcn2_old(p, x, d, s2, d2, ct, deg):
    h = rgcn_apply_padded(p["rgcn1"], x, s2, d2, ct, deg, gs.n_drug, gs.n_et,
                          backend=model.backend, kernel_dtype=kd, dense_adj=d)
    h = jax.nn.relu(h)
    return rgcn_apply_padded(p["rgcn2"], h, s2, d2, ct, deg, gs.n_drug,
                             gs.n_et, backend=model.backend, kernel_dtype=kd,
                             dense_adj=d)
gargs = (graph["dd_src2d"], graph["dd_dst2d"], graph["dd_chunk_type"],
         graph["dd_deg"])
rgo = jax.jit(lambda p, x, d, s2, d2, ct, deg, a: fold(*jax.value_and_grad(
    lambda px: jnp.sum(rgcn2_old(px[0], px[1], d, s2, d2, ct, deg)))(
    (jax.tree.map(lambda t: t + a * 0, p), x))))
report("rgcn 2-layer fwd+bwd OLD", slope(
    lambda i, a: rgo(enc, xin, da, *gargs, a)))

rgn = jax.jit(lambda p, x, d, deg, a: fold(*jax.value_and_grad(
    lambda px: jnp.sum(dense_rgcn_pair_apply(
        px[0]["rgcn1"], px[0]["rgcn2"], px[1], d, deg)))(
    (jax.tree.map(lambda t: t + a * 0, p), x))))
report("rgcn 2-layer fwd+bwd NEW", slope(
    lambda i, a: rgn(enc, xin, da, graph["dd_deg"], a)))

# full train step (sanity anchor vs bench; uses the NEW encoder wiring)
import optax

opt = optax.adam(0.01)
ost = opt.init(params)
step = jax.jit(lambda p, o, g, k: (lambda l, gr: (
    optax.apply_updates(p, opt.update(gr, o, p)[0]),
    opt.update(gr, o, p)[1], l))(
    *jax.value_and_grad(lambda q: model.loss(q, g, k))(p)))
ps, os_, _ = step(params, ost, graph, jax.random.key(1))
for i in range(3):
    ps, os_, l = step(ps, os_, graph, jax.random.fold_in(jax.random.key(2), i))
float(l)
t0 = time.perf_counter()
for i in range(20):
    ps, os_, l = step(ps, os_, graph, jax.random.fold_in(jax.random.key(3), i))
float(l)
report("FULL STEP (new rgcn pair)", (time.perf_counter() - t0) / 20 * 1000)
