"""Standalone latency: sym-packed vs full-tile fused dense BCE at Decagon
scale (real data).  Chained-iteration slope timing (N dependent calls, one
fetch); pages passed as jit ARGUMENTS (a closure would inline them as
constants into the remote-compile payload — HTTP 413 on axon)."""
import time

import jax
import jax.numpy as jnp

from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.data.packing import (
    cast_dense_adj, dense_relation_adj, pad_dense_adj,
    poisson_neg_thresholds, poisson_neg_thresholds_sym, sym_block_pack,
)
from tip_tpu.ops.pallas_dense_bce import dense_bce_sum
from tip_tpu.ops.pallas_dense_bce_sym import dense_bce_sym_sum

N = 20


def fwd_time(fn, w, z, pages, q, key):
    def chain(w, z, pages, q, key):
        acc = jnp.zeros(())
        for _ in range(N):
            acc = acc + fn(w, z + acc * 1e-30, pages, q, key)
        return acc

    c = jax.jit(chain)
    jax.block_until_ready(c(w, z, pages, q, key))
    t0 = time.time()
    jax.block_until_ready(c(w, z, pages, q, key))
    return (time.time() - t0) / N


def fwdbwd_time(fn, w, z, pages, q, key):
    def chain(w, z, pages, q, key):
        acc = jnp.zeros(())
        for _ in range(N):
            val, (dw, dz) = jax.value_and_grad(
                lambda w, z: fn(w, z, pages, q, key), argnums=(0, 1)
            )(w, z + acc * 1e-30)
            acc = acc + val + jnp.sum(dw) * 1e-30 + jnp.sum(dz) * 1e-30
        return acc

    c = jax.jit(chain)
    jax.block_until_ready(c(w, z, pages, q, key))
    t0 = time.time()
    jax.block_until_ready(c(w, z, pages, q, key))
    return (time.time() - t0) / N


def main():
    raw = load_decagon_raw()
    data = cached_trigraph(raw, split_rate=0.9, seed=1111)
    da = dense_relation_adj(data.dd_train, data.n_drug)
    full = jnp.asarray(pad_dense_adj(cast_dense_adj(da, jnp.bfloat16)))
    q3 = jnp.asarray(poisson_neg_thresholds(data.dd_train, data.n_drug))
    sym = jnp.asarray(sym_block_pack(da))
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
        t1 = fwd_time(fn, w, z, pages, q, key)
        t2 = fwdbwd_time(fn, w, z, pages, q, key)
        gbs = pages.nbytes / t1 / 1e9
        print(f"{name}: fwd {t1*1e3:.2f} ms ({gbs:.0f} GB/s page stream), "
              f"fwd+bwd {t2*1e3:.2f} ms")


if __name__ == "__main__":
    main()
