"""Standalone latency: sym-packed vs full-tile fused dense BCE at Decagon
scale (real data).  Slope timing like scripts/component_latency.py: each
iteration is a separate jitted dispatch chained through an `a * 0` input
(no CSE), and the k2-k1 slope cancels per-dispatch overhead."""
import time

import jax
import jax.numpy as jnp

from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.data.packing import (
    cast_dense_adj, dense_relation_adj, pad_dense_adj,
    poisson_neg_thresholds, poisson_neg_thresholds_sym, sym_strip_pack,
)
from tip_tpu.ops.pallas_dense_bce import dense_bce_sum
from tip_tpu.ops.pallas_dense_bce_sym import dense_bce_sym_sum


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


def main():
    raw = load_decagon_raw()
    data = cached_trigraph(raw, split_rate=0.9, seed=1111)
    da = dense_relation_adj(data.dd_train, data.n_drug)
    full = jnp.asarray(pad_dense_adj(cast_dense_adj(da, jnp.bfloat16)))
    q3 = jnp.asarray(poisson_neg_thresholds(data.dd_train, data.n_drug))
    sym = jnp.asarray(sym_strip_pack(da))
    q8 = jnp.asarray(poisson_neg_thresholds_sym(data.dd_train, data.n_drug))
    print(f"full pages: {full.nbytes/1e6:.0f} MB  sym: {sym.nbytes/1e6:.0f} MB")
    d = 16
    k1, k2 = jax.random.split(jax.random.key(0))
    w = jax.random.normal(k1, (data.n_et, d)) * 0.3
    z = jax.random.normal(k2, (data.n_drug, d)) * 0.5
    key = jax.random.key(7)

    for name, fn, pages, q in (
        ("full", dense_bce_sum, full, q3),
        ("sym", dense_bce_sym_sum, sym, q8),
    ):
        fwd = jax.jit(lambda w, z, pages, q, a, fn=fn: fn(w, z + a * 0, pages, q, key))
        t1 = slope(lambda i, a: fwd(w, z, pages, q, a))
        vgr = jax.jit(lambda w, z, pages, q, a, fn=fn: (
            lambda v, g: v + 1e-20 * (jnp.sum(g[0]) + jnp.sum(g[1])))(
            *jax.value_and_grad(
                lambda w, z: fn(w, z, pages, q, key), argnums=(0, 1)
            )(w, z + a * 0)))
        t2 = slope(lambda i, a: vgr(w, z, pages, q, a))
        gbs = pages.nbytes / (t1 / 1e3) / 1e9
        print(f"{name}: fwd {t1:.2f} ms ({gbs:.0f} GB/s page stream), "
              f"fwd+bwd {t2:.2f} ms")


if __name__ == "__main__":
    main()
