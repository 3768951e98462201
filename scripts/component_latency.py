"""Per-component device time via chained-iteration slope fitting.

profile_step.py's naive per-call timing is swamped by the axon tunnel's
sync latency; here each component runs K chained iterations with ONE value
fetch, and time(K2)-time(K1) / (K2-K1) gives the true device time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from tip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
from tip_tpu.config import ModelConfig
from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.sampling import typed_negative_sampling_chunked
from tip_tpu.train.model import TIP, make_graph_arrays

kd = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
dense = len(sys.argv) > 2 and sys.argv[2] == "dense"
raw = load_decagon_raw()
data = cached_trigraph(raw, split_rate=0.9, seed=1111)
from tip_tpu.train.model import preferred_dense_dtype

graph, gs = make_graph_arrays(
    data, dense_dtype=preferred_dense_dtype(data, kd) if dense else None
)
model = TIP.for_data(ModelConfig.tip_cat(kernel_dtype=kd), data, gs,
                     backend="auto")
print(f"backend={model.backend} kernel_dtype={kd} dense={dense}")
params = model.init(jax.random.key(0))
opt = optax.adam(0.01)
opt_state = opt.init(params)


def slope(fn, k1=4, k2=24):
    """fn(i) must return a scalar-reducible output; returns ms/iter."""

    def run(k):
        acc = jnp.zeros(())
        for i in range(k):
            acc = acc + fn(i, acc)
        return float(acc), None

    run(2)  # compile + warm
    t0 = time.perf_counter(); run(k1); t1 = time.perf_counter()
    run(k2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1000


z0 = jax.jit(model.encode)(params, graph)

# acc feeds back into an input so iterations chain and nothing is CSE'd
enc = jax.jit(lambda p, g, a: jnp.sum(model.encode(
    {"encoder": jax.tree.map(lambda x: x + a * 0, p["encoder"]),
     "decoder": p["decoder"]}, g)))
print(f"encode fwd        {slope(lambda i, a: enc(params, graph, a)):8.2f} ms")

samp = jax.jit(lambda k, g: typed_negative_sampling_chunked(
    k, g["dd_chunk_type"], g["dd_bitmap"], gs.n_drug, gs.n_et, gs.dd_chunk,
    backend=model.backend))
def samp_fn(i, a):
    s, d = samp(jax.random.fold_in(jax.random.key(7), i + jnp.int32(a * 0)), graph)
    return jnp.sum(s) * 1e-12
print(f"neg sampling      {slope(samp_fn):8.2f} ms")

dec = jax.jit(lambda p, z, g, a: jnp.sum(model.score_padded(
    p, z + a * 0, g["dd_src2d"], g["dd_dst2d"], g["dd_chunk_type"],
    sigmoid=False)))
print(f"decoder fwd (pos) {slope(lambda i, a: dec(params, z0, graph, a) * 1e-9):8.2f} ms")

lossf = jax.jit(lambda p, g, k, a: model.loss(
    {"encoder": jax.tree.map(lambda x: x + a * 0, p["encoder"]),
     "decoder": p["decoder"]}, g, k))
print(f"loss fwd          {slope(lambda i, a: lossf(params, graph, jax.random.key(i), a)):8.2f} ms")

# grads folded into the scalar so the backward pass isn't dead code
def _with_grads(v, gr):
    return v + 1e-20 * sum(jnp.sum(x) for x in jax.tree.leaves(gr))

gradf = jax.jit(lambda p, g, k, a: _with_grads(*jax.value_and_grad(
    lambda q: model.loss(q, g, k))(
    {"encoder": jax.tree.map(lambda x: x + a * 0, p["encoder"]),
     "decoder": p["decoder"]})))
print(f"loss fwd+bwd      {slope(lambda i, a: gradf(params, graph, jax.random.key(i), a)):8.2f} ms")

encg = jax.jit(lambda p, g, a: _with_grads(*jax.value_and_grad(
    lambda q: jnp.sum(model.encode(q, g)))(
    {"encoder": jax.tree.map(lambda x: x + a * 0, p["encoder"]),
     "decoder": p["decoder"]})))
print(f"encode fwd+bwd    {slope(lambda i, a: encg(params, graph, a)):8.2f} ms")
