"""Validate + time the fused dense BCE kernel on the real chip.

1. fwd / fwd+bwd latency at the benched Decagon config;
2. realized negative-count distribution: with w = z = 0 every logit is 0,
   so total = log(2) * (sum DA + sum C) — solving for sum C measures the
   on-chip PRNG's realized draw total against E = n_valid (Binomial mean)
   across seeds;
3. value sanity vs the XLA dense-positive path: with a shared (w, z), the
   positive half must match distmult_dense_pos_bce_sum and the negative
   half must land near m_t-weighted mean softplus.
4. 100-epoch TIP-cat train with negatives='poisson': step time + AUPRC
   (compare: sampled-estimator run reached 0.8973 at 100 ep, RESULTS.md).

Usage: python scripts/probe_dense_bce.py [--skip-train]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
from tip_tpu.config import ModelConfig
from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.ops.pallas_dense_bce import dense_bce_sum
from tip_tpu.train.model import (
    TIP, make_graph_arrays, make_test_arrays, preferred_dense_dtype,
)

kd = "float32"
data = cached_trigraph(load_decagon_raw(), split_rate=0.9, seed=1111)
graph, gs = make_graph_arrays(data, dense_dtype=preferred_dense_dtype(data, kd))
cfg = ModelConfig.tip_cat(kernel_dtype=kd)
model = TIP.for_data(cfg, data, gs, backend="auto")
params = model.init(jax.random.key(0))
print(f"backend={model.backend}", flush=True)


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


def fold(v, gr):
    return v + 1e-20 * sum(jnp.sum(x) for x in jax.tree.leaves(gr))


da = graph["dd_adj_t"]
qq = graph["dd_neg_q"]
w0 = params["decoder"]["weight"]
z0 = jax.jit(model.encode)(params, graph)

f = jax.jit(lambda w, z, d, q, k, a: dense_bce_sum(w + a * 0, z, d, q, k))
ms = slope(lambda i, a: f(w0, z0, da, qq, jax.random.fold_in(jax.random.key(5), i), a) * 1e-9)
print(f"dense BCE fwd            {ms:8.2f} ms", flush=True)

g = jax.jit(lambda w, z, d, q, k, a: fold(*jax.value_and_grad(
    lambda wz: dense_bce_sum(wz[0], wz[1], d, q, k) * 1e-9)((w + a * 0, z))))
ms = slope(lambda i, a: g(w0, z0, da, qq, jax.random.fold_in(jax.random.key(5), i), a))
print(f"dense BCE fwd+bwd        {ms:8.2f} ms", flush=True)

# --- realized negative-count distribution ---
wz_zero = (jnp.zeros_like(w0), jnp.zeros_like(z0))
tot_da = float(jnp.sum(da.astype(jnp.float32)))
counts = []
for s in range(20):
    v = float(f(wz_zero[0], wz_zero[1], da, qq, jax.random.key(100 + s), 0.0))
    counts.append(v / np.log(2.0) - tot_da)
counts = np.array(counts)
expect = gs.dd_n_valid
print(json.dumps({
    "neg_count_mean": counts.mean(), "neg_count_sd": counts.std(),
    "expected": expect, "rel_err": abs(counts.mean() - expect) / expect,
    "sd_theory": float(np.sqrt(expect)),
}), flush=True)

# --- value split vs XLA positive oracle ---
from tip_tpu.nn.decoders import distmult_dense_pos_bce_sum

pos_only = float(jax.jit(
    lambda w, z, d: distmult_dense_pos_bce_sum(w, z, d, kernel_dtype=kd)
)(w0, z0, da))
vals = [float(f(w0, z0, da, qq, jax.random.key(200 + s), 0.0))
        for s in range(8)]
print(json.dumps({"fused_mean": np.mean(vals), "pos_only_xla": pos_only,
                  "neg_part_mean": np.mean(vals) - pos_only}), flush=True)

if "--skip-train" in sys.argv:
    sys.exit(0)

# --- 100-epoch accuracy run, fused path ---
import optax

opt = optax.adam(0.01)
ost = opt.init(params)
step = jax.jit(lambda p, o, g_, k: (
    lambda l, gr: (optax.apply_updates(p, opt.update(gr, o, p)[0]),
                   opt.update(gr, o, p)[1], l)
)(*jax.value_and_grad(lambda q: model.loss(q, g_, k))(p)))
ps, os_, l = step(params, ost, graph, jax.random.key(1))
float(l)
t0 = time.perf_counter()
key = jax.random.key(1111)
hist = []
for ep in range(100):
    key, k = jax.random.split(key)
    ps, os_, l = step(ps, os_, graph, k)
    hist.append({"epoch": ep, "loss": float(l)})
dt = (time.perf_counter() - t0) / 100
print(f"train 100 ep: {dt*1000:.1f} ms/step, final loss {hist[-1]['loss']:.4f}",
      flush=True)

test = make_test_arrays(data)
test_neg = model.sample_test_negatives(jax.random.key(2024), test)
per_rel, macro = jax.jit(model.evaluate)(ps, graph, test, test_neg)
out = {"sec_per_step": dt, "final_loss": hist[-1]["loss"],
       "auprc": float(macro["auprc"]), "auroc": float(macro["auroc"]),
       "ap": float(macro["ap"]), "history": hist}
print(json.dumps({k: v for k, v in out.items() if k != "history"}), flush=True)
with open("runs/tip_cat_poisson_100ep.json", "w") as fjson:
    json.dump({"variant": "tip-cat poisson dense BCE", **out}, fjson)
