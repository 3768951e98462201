"""Round-4 roofline probe: per-subcomponent device times + measured machine
rates (HBM stream, VPU softplus, MXU GEMM) so each step component gets a
computed floor instead of a bare measurement (VERDICT r3, Weak #1).

Runs on the real chip; chained-iteration slope timing as in
scripts/component_latency.py (axon sync latency would swamp naive timing).
Usage: python scripts/roofline_probe.py [float32|bfloat16] > runs/roofline_probe.out
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
raw = load_decagon_raw()
data = cached_trigraph(raw, split_rate=0.9, seed=1111)
graph, gs = make_graph_arrays(data, dense_dtype=preferred_dense_dtype(data, kd))
cfg = ModelConfig.tip_cat(kernel_dtype=kd)
model = TIP.for_data(cfg, data, gs, backend="auto")
params = model.init(jax.random.key(0))
print(f"backend={model.backend} kernel_dtype={kd} "
      f"dense_adj={graph['dd_adj_t'].dtype} pp_a1={graph['pp_a1'].dtype}")


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


def report(name, ms, note=""):
    print(f"{name:34s} {ms:8.2f} ms  {note}")


da = graph["dd_adj_t"]          # [R, n, n] bf16
a1 = graph["pp_a1"]             # [Np, Np] bf16
R, n, _ = da.shape
Np = a1.shape[0]

# ---- machine rates ---------------------------------------------------------
# HBM read rate: full-array reduce (write side is negligible)
red = jax.jit(lambda x, a: jnp.sum(x.astype(jnp.float32) + a * 0))
ms = slope(lambda i, a: red(da, a))
print(f"[rate] HBM stream (sum over da, {da.nbytes/1e6:.0f} MB)   "
      f"{ms:8.2f} ms -> {da.nbytes/1e9/(ms/1e3):6.1f} GB/s")
ms = slope(lambda i, a: red(a1, a))
print(f"[rate] HBM stream (sum over pp_a1, {a1.nbytes/1e6:.0f} MB) "
      f"{ms:8.2f} ms -> {a1.nbytes/1e9/(ms/1e3):6.1f} GB/s")

# VPU softplus throughput at the BCE's exact shape/dtype regime:
# f32 [R, n, n]-sized blocks (generated on the fly, no HBM read of inputs)
nel = R * n * n
blk = jnp.ones((128, n, n), jnp.float32)
sp = jax.jit(lambda x, a: jnp.sum(jax.nn.softplus(x + a)))
ms_sp = slope(lambda i, a: sp(blk, a * 1e-20))
print(f"[rate] softplus+reduce f32 [128,{n},{n}] ({blk.size/1e6:.0f}M el) "
      f"{ms_sp:8.2f} ms -> {blk.size/1e9/(ms_sp/1e3):6.2f} Gel/s")
sg = jax.jit(lambda x, a: jnp.sum(jax.nn.sigmoid(x + a)))
ms_sg = slope(lambda i, a: sg(blk, a * 1e-20))
print(f"[rate] sigmoid+reduce  f32 [128,{n},{n}]              "
      f"{ms_sg:8.2f} ms -> {blk.size/1e9/(ms_sg/1e3):6.2f} Gel/s")

# MXU rate at the dense R-GCN GEMM shape (bf16 adjacency x f32 activations)
x64 = jnp.ones((n, 64), jnp.float32)
g1 = jax.jit(lambda d, x, a: jnp.sum(jnp.einsum(
    "tds,sf->tfd", d, x + a * 0, preferred_element_type=jnp.float32)) * 1e-9)
ms = slope(lambda i, a: g1(da, x64, a))
fl = 2.0 * R * n * n * 64
print(f"[rate] dense rgcn GEMM d=64 (da bf16)              "
      f"{ms:8.2f} ms -> {fl/1e12/(ms/1e3):6.1f} TFLOP/s, da at "
      f"{da.nbytes/1e9/(ms/1e3):5.1f} GB/s")

# ---- restructure probe: M-first (att-contract first) -----------------------
att = jnp.asarray(params["encoder"]["rgcn1"]["att"])  # [R, B]
B = att.shape[1]
m1 = jax.jit(lambda d, t, a: jnp.sum(jnp.einsum(
    "tb,tds->bds", t + a * 0, d, preferred_element_type=jnp.float32)) * 1e-9)
ms_m = slope(lambda i, a: m1(da, att, a))
print(f"[rate] M = att^T @ da  [B={B}]                      "
      f"{ms_m:8.2f} ms -> da at {da.nbytes/1e9/(ms_m/1e3):5.1f} GB/s")
M0 = jnp.einsum("tb,tds->bds", att, da, preferred_element_type=jnp.float32)
q1 = jax.jit(lambda m, x, a: jnp.sum(jnp.einsum(
    "bds,sf->bdf", m, x + a * 0, preferred_element_type=jnp.float32)) * 1e-9)
ms_q = slope(lambda i, a: q1(M0, x64, a))
print(f"[rate] q = M @ x  d=64                              {ms_q:8.2f} ms")

# both layers' M in one pass (concat along b): 2B columns
att2 = jnp.concatenate([att, att], axis=1)
ms_m2 = slope(lambda i, a: m1(da, att2, a))
print(f"[rate] M2 = att2^T @ da  [2B={2*B}]                 {ms_m2:8.2f} ms")

# ---- current components, finer grain ---------------------------------------
from tip_tpu.nn.decoders import distmult_dense_pos_bce_sum
w = params["decoder"]["weight"]
z0 = jax.jit(model.encode)(params, graph)
pos = jax.jit(lambda w, z, d, a: distmult_dense_pos_bce_sum(
    w + a * 0, z, d, kernel_dtype=kd))
report("pos BCE fwd", slope(lambda i, a: pos(w, z0, da, a)))
posg = jax.jit(lambda w, z, d, a: jax.value_and_grad(
    lambda wz: distmult_dense_pos_bce_sum(wz[0], wz[1], d, kernel_dtype=kd)
)((w + a * 0, z))[0])
report("pos BCE fwd+bwd", slope(lambda i, a: posg(w, z0, da, a)))

from tip_tpu.sampling import typed_negative_sampling_chunked
samp = jax.jit(lambda k, g: typed_negative_sampling_chunked(
    k, g["dd_chunk_type"], g["dd_bitmap"], gs.n_drug, gs.n_et, gs.dd_chunk,
    backend=model.backend, planes=g.get("dd_bitmap_planes")))
def samp_fn(i, a):
    s, d = samp(jax.random.fold_in(jax.random.key(7), i + jnp.int32(a * 0)), graph)
    return jnp.sum(s) * 1e-12
report("sampler", slope(samp_fn))

# negative SDDMM fwd and fwd+bwd (scores at the padded chunk layout)
sneg, dneg = samp(jax.random.key(3), graph)
dneg_ = jnp.asarray(dneg)
dec = jax.jit(lambda p, z, a: jnp.sum(model.score_padded(
    p, z + a * 0, sneg, dneg_, graph["dd_chunk_type"], sigmoid=False)) * 1e-9)
report("neg SDDMM fwd", slope(lambda i, a: dec(params, z0, a)))
decg = jax.jit(lambda p, z, a: jax.value_and_grad(lambda zz: jnp.sum(
    model.score_padded(p, zz, sneg, dneg_, graph["dd_chunk_type"],
                       sigmoid=False)))(z + a * 0)[0] * 1e-9)
report("neg SDDMM fwd+bwd", slope(lambda i, a: decg(params, z0, a)))

# P-P dense encoder piece (params are nested conv1/conv2 dicts; big
# buffers are jit ARGS — closure constants trip the tunnel's 413 limit)
from tip_tpu.nn.encoders import pp_encoder_apply_dense
wp = params["encoder"]["pp"]
ppf = jax.jit(lambda p, a1, di, a: jnp.sum(pp_encoder_apply_dense(
    jax.tree.map(lambda x: x + a * 0, p), None, a1, di)))
report("pp dense 2-layer fwd", slope(
    lambda i, a: ppf(wp, graph["pp_a1"], graph["pp_dinv"], a)))

# dense rgcn layer1 fwd as shipped (pt einsum path)
from tip_tpu.nn.rgcn import rgcn_apply_padded
r1 = params["encoder"]["rgcn1"]
xin = jnp.ones((n, 64), jnp.float32)
rg = jax.jit(lambda p, x, a: jnp.sum(rgcn_apply_padded(
    p, x + a * 0, graph["dd_src2d"], graph["dd_dst2d"], graph["dd_chunk_type"],
    graph["dd_deg"], n, gs.n_et, backend=model.backend, kernel_dtype=kd,
    dense_adj=da)))
report("rgcn layer1 fwd (shipped, d=64)", slope(lambda i, a: rg(r1, xin, a)))
