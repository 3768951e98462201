"""Where do the M-first R-GCN pair's 5.2 ms fwd+bwd go?  (floor ~2.9 ms
with the padded adjacency).  Times each algebraic piece in isolation."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from tip_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.train.model import make_graph_arrays, preferred_dense_dtype
from tip_tpu.nn.rgcn import dense_rgcn_pair_apply, rgcn_init

data = cached_trigraph(load_decagon_raw(), split_rate=0.9, seed=1111)
graph, gs = make_graph_arrays(data, dense_dtype=preferred_dense_dtype(data))
da = graph["dd_adj_t"]; deg = graph["dd_deg"]
R = da.shape[0]
p1 = rgcn_init(jax.random.key(0), 64, 32, R, 32, False)
p2 = rgcn_init(jax.random.key(1), 32, 16, R, 32, True)
x = jax.random.normal(jax.random.key(2), (gs.n_drug, 64)) * 0.3

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

def fold(v, gr):
    return v + 1e-20 * sum(jnp.sum(t) for t in jax.tree.leaves(gr))

att_cat = jnp.concatenate([p1["att"], p2["att"]], axis=1)
m_f = jax.jit(lambda a, d, s: jnp.sum(jnp.einsum(
    "tb,tds->bds", a + s * 0, d, preferred_element_type=jnp.float32)) * 1e-9)
print(f"M fwd (padded da)        {slope(lambda i, a: m_f(att_cat, da, a)):8.2f} ms", flush=True)
m_g = jax.jit(lambda a, d, s: fold(*jax.value_and_grad(
    lambda aa: jnp.sum(jnp.einsum("tb,tds->bds", aa, d,
    preferred_element_type=jnp.float32)) * 1e-9)(a + s * 0)))
print(f"M fwd+bwd                {slope(lambda i, a: m_g(att_cat, da, a)):8.2f} ms", flush=True)
pair_f = jax.jit(lambda q1, q2, xx, d, dg, s: jnp.sum(dense_rgcn_pair_apply(
    jax.tree.map(lambda t: t + s * 0, q1), q2, xx, d, dg)))
print(f"pair fwd                 {slope(lambda i, a: pair_f(p1, p2, x, da, deg, a)):8.2f} ms", flush=True)
pair_g = jax.jit(lambda q1, q2, xx, d, dg, s: fold(*jax.value_and_grad(
    lambda pp: jnp.sum(dense_rgcn_pair_apply(pp[0], pp[1], pp[2], d, dg)))(
    (jax.tree.map(lambda t: t + s * 0, q1), q2, xx))))
print(f"pair fwd+bwd             {slope(lambda i, a: pair_g(p1, p2, x, da, deg, a)):8.2f} ms", flush=True)
