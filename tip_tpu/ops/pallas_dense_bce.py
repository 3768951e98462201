"""Fused dense BCE kernel: positives + Poissonized negatives in one pass.

The DistMult training loss over a relation t decomposes per (dst, src)
cell of the dense relation adjacency (data/packing.py:dense_relation_adj):

    loss_t = sum_cells  DA[t]   * softplus(-L_t)      (positives)
           + sum_cells  C[t]    * softplus(+L_t)      (negatives)

with L_t = (z * w_t) @ z^T the dense logit tile and C[t] the per-cell count
of sampled negatives.  The reference corrupts one negative per positive,
uniform over the relation's non-positive cells (reference:
src/neg_sampling.py:5-26).  Replacing the exact multinomial draw with
independent per-cell counts C[t,c] ~ Binomial(m_t, 1/nonpos_t) — the
POISSONIZATION of the same sampler — keeps the expected loss and every
per-cell marginal identical (E C = m_t / nonpos_t uniform over non-positive
cells) while making the negative half DATA-INDEPENDENT dense work: no
per-edge gathers, no membership bitmap, no separate sampler kernel.  Only
the total negative count becomes Binomial(~Poisson) instead of exactly m_t
(sd ~ sqrt(m_t), i.e. ~0.03% of the 8.3M-draw total at Decagon scale); the
loss keeps the deterministic 1/m normalization, so this is an unbiased
estimator of the same objective with negligibly wider variance
(accuracy-validated end to end, RESULTS.md).

Against the r3 pipeline this one kernel replaces the Pallas sampler
(7.5 ms: draw + bitmap membership + borrow), the two-level negative SDDMM
(4.5 ms fwd + backward scatters), and the dense positive BCE (XLA, 2
adjacency streams + 456M-logit HBM round trips): the adjacency streams
ONCE forward and ONCE backward, logits never touch HBM, and one
softplus/sigmoid per cell serves both halves via
softplus(x) = softplus(-x) + x and sigmoid(x) = 1 - sigmoid(-x).

Sampling in-kernel uses the on-chip hardware PRNG seeded per relation from
(step seed, program_id) — bit-identical reseeding in the backward kernel
reproduces the forward's counts without materializing them.  Counts are
drawn by inverse-CDF on one 24-bit uniform against per-relation Binomial
tail thresholds q_k = P(X >= k), k = 1..3 (host-precomputed,
data/packing.py:poisson_neg_thresholds): count = sum_k 1[u < q_k] follows
min(X, 3) exactly; P(X >= 4) < 2e-5 even for the densest Decagon relation.

Custom VJP: d/dL [DA softplus(-L) + C softplus(L)] = -DA sg + C (1 - sg)
with sg = sigmoid(-L); per relation the backward contracts the [n, n]
cotangent tile G with z from both sides (H = G @ z, Ht = G^T @ z, both on
the MXU, no transposes materialized):

    dw_t = sum_rows z * H          dz += w_t * (H + Ht)

Grads flow to z and w only — the adjacency and thresholds are data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _counts(u24, q_ref, t, da, valid):
    """Per-cell negative counts from a 24-bit uniform draw.

    q_ref: SMEM [R * 3] int32 thresholds (floor(P(X >= k) * 2^24)).
    Positive cells (da > 0) and tile-padding cells (``valid`` False — the
    pages are padded to HBM tile bounds, data/packing.py:pad_dense_adj) are
    excluded; the reference rejects collisions with same-relation
    positives.
    """
    cnt = jnp.zeros(u24.shape, jnp.float32)
    for k in range(3):
        cnt = cnt + (u24 < q_ref[3 * t + k]).astype(jnp.float32)
    return jnp.where((da > 0) | jnp.logical_not(valid), jnp.float32(0), cnt)


# Relation pages processed per grid step.  The strip probe
# (runs/strip_probe_bce.out) showed one-page-per-step pipelining pays
# ~4 us/page of dispatch/DMA-issue overhead — 4.7 ms just to STREAM the
# 1,097 pages that one XLA reduce covers in 1.13 ms.  Batching P pages per
# step divides that overhead by P; the elementwise work runs per page
# inside the step so VMEM holds one [n, n] working set at a time.
PAGES = 4


def _valid_mask(nt, n1, n2):
    if (n1, n2) == (nt, nt):
        return jnp.full((n1, n2), True)
    row = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
    return (row < nt) & (col < nt)


# Depth of the manual DMA ring on hardware (strip probe: a 4-deep
# make_async_copy pipeline streams the pages at 461 GB/s vs 353 for the
# automatic grid pipeline and 195 for unaligned blocks —
# runs/strip_probe_bce4.out).
NBUF = 4


def _common(nt, seed_ref, q_ref, t, w_row, z, zt, da_bf16, grads: bool):
    """Per-page math shared by both drivers: logits, softplus/sigmoid,
    in-kernel Poisson counts.  Returns (loss_page,) or (g,) cotangent."""
    n1, n2 = da_bf16.shape
    pltpu.prng_seed(seed_ref[0], t)
    da = da_bf16.astype(jnp.float32)
    logits = jnp.dot(z * w_row, zt, preferred_element_type=jnp.float32)
    u24 = jax.lax.shift_right_logical(
        pltpu.bitcast(pltpu.prng_random_bits((n1, n2)), jnp.int32), 8
    )
    cnt = _counts(u24, q_ref, t, da, _valid_mask(nt, n1, n2))
    if not grads:
        sp = jax.nn.softplus(-logits)
        return jnp.sum(sp * da + (sp + logits) * cnt)
    sg = jax.nn.sigmoid(-logits)
    return cnt - sg * (da + cnt)


def _fwd_kernel(nt, n_et, seed_ref, q_ref, w_ref, zt_ref, da_ref, z_ref,
                out_ref):
    i = pl.program_id(0)
    z = z_ref[...]  # [n1, d] f32 (rows >= nt zero)
    zt = zt_ref[...]
    for p in range(PAGES):
        t = i * PAGES + p
        out_ref[p, 0, 0] = 0.0  # pad pages of the last block stay zero

        @pl.when(t < n_et)
        def _():
            out_ref[p, 0, 0] = _common(
                nt, seed_ref, q_ref, t, w_ref[p], z, zt, da_ref[p],
                grads=False,
            )


def _bwd_kernel(nt, n_et, seed_ref, q_ref, w_ref, zt_ref, da_ref, z_ref,
                dw_ref, dz_ref):
    i = pl.program_id(0)
    z = z_ref[...]
    zt = zt_ref[...]

    @pl.when(i == 0)
    def _():
        dz_ref[...] = jnp.zeros_like(dz_ref)

    for p in range(PAGES):
        t = i * PAGES + p

        @pl.when(t < n_et)
        def _():
            # dLoss/dlogits = -DA*sg + C*(1-sg) from the reseeded counts;
            # H[i,f] = sum_j G[i,j] z[j,f] contracts the SOURCE axis
            # against z^T's lane axis (no transpose materialized), Ht
            # likewise contracts the DEST axis against the [n1, d] z copy.
            # Rows beyond the true extent are zero (g vanishes there).
            g = _common(nt, seed_ref, q_ref, t, w_ref[p], z, zt, da_ref[p],
                        grads=True)
            h = jax.lax.dot_general(  # [n1, d]
                g, zt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ht = jax.lax.dot_general(  # [n2, d]
                g, z, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw_ref[p, 0] = jnp.sum(z * h, axis=0)
            dz_ref[...] += w_ref[p] * (h + ht[: h.shape[0]])


def _fwd_manual_kernel(nt, n_et, seed_ref, q_ref, w_ref, zt_ref, da_hbm,
                       z_ref, out_ref):
    z = z_ref[...]
    zt = zt_ref[...]

    def body(scratch, sems):
        def dma(slot, page):
            return pltpu.make_async_copy(
                da_hbm.at[page], scratch.at[slot], sems.at[slot]
            )

        for p in range(NBUF - 1):
            dma(p, p).start()

        def loop(t, acc):
            nxt = t + NBUF - 1

            @pl.when(nxt < n_et)
            def _():
                dma(nxt % NBUF, nxt).start()

            dma(t % NBUF, t).wait()
            return acc + _common(
                nt, seed_ref, q_ref, t, w_ref[pl.ds(t, 1), 0, :], z, zt,
                scratch[t % NBUF], grads=False,
            )

        out_ref[0, 0] = jax.lax.fori_loop(0, n_et, loop, jnp.float32(0))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((NBUF,) + da_hbm.shape[1:], da_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((NBUF,)),
    )


def _call_manual(kernel, out_shape, out_specs, w, z, dense_adj, q_flat,
                 seed_arr):
    n_et, n1, n2 = dense_adj.shape
    nt, d = z.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_et, 1, d), lambda i, *sp: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # all w rows resident
            pl.BlockSpec((d, n2), lambda i, *sp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # adjacency stays in HBM
            pl.BlockSpec((n1, d), lambda i, *sp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    zf = z.astype(jnp.float32)
    z1 = jnp.pad(zf, ((0, n1 - nt), (0, 0)))
    zt = jnp.pad(zf, ((0, n2 - nt), (0, 0))).T
    return pl.pallas_call(
        functools.partial(kernel, nt, n_et),
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_et * n1 * n2 * (3 * d),
            bytes_accessed=int(dense_adj.nbytes) + n_et * n1 * n2 * 4,
            transcendentals=n_et * n1 * n2,
        ),
    )(seed_arr, q_flat, w.astype(jnp.float32)[:, None, :], zt, dense_adj, z1)


def _use_manual() -> bool:
    # The manual DMA ring needs real hardware semantics; the automatic
    # grid pipeline serves interpret mode / CPU tests.
    return jax.default_backend() == "tpu"


def _call(kernel, out_shape, out_specs, w, z, dense_adj, q_flat, seed_arr):
    n_et, n1, n2 = dense_adj.shape
    nt, d = z.shape
    n_blk = -(-n_et // PAGES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seed, thresholds
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((PAGES, 1, d), lambda i, *sp: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # w rows
            pl.BlockSpec((d, n2), lambda i, *sp: (0, 0),
                         memory_space=pltpu.VMEM),  # z^T (resident)
            pl.BlockSpec((PAGES, n1, n2), lambda i, *sp: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # adjacency pages
            pl.BlockSpec((n1, d), lambda i, *sp: (0, 0),
                         memory_space=pltpu.VMEM),  # z (resident)
        ],
        out_specs=out_specs,
    )
    zf = z.astype(jnp.float32)
    z1 = jnp.pad(zf, ((0, n1 - nt), (0, 0)))
    zt = jnp.pad(zf, ((0, n2 - nt), (0, 0))).T
    # pad the relation axis of the SMALL per-relation operands to the block
    # multiple (the adjacency keeps its true extent: partial final block
    # reads are discarded by the t < n_et guard)
    pad = n_blk * PAGES - n_et
    w3 = jnp.pad(w.astype(jnp.float32)[:, None, :], ((0, pad), (0, 0), (0, 0)))
    return pl.pallas_call(
        functools.partial(kernel, nt, n_et),
        out_shape=out_shape,
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_et * n1 * n2 * (3 * d),
            bytes_accessed=int(dense_adj.nbytes) + n_et * n1 * n2 * 4,
            transcendentals=n_et * n1 * n2,
        ),
    )(seed_arr, q_flat, w3, zt, dense_adj, z1)


def dense_bce_sum(w, z, dense_adj, q_int, key):
    """Scalar sum of positive + Poissonized-negative BCE terms.

    w: [n_et, d] DistMult relation vectors; z: [n, d] embeddings;
    dense_adj: [n_et, n, n] counts (bf16/f32); q_int: [n_et, 3] int32
    Binomial tail thresholds scaled by 2^24; key: jax PRNG key.
    """
    seed_arr = jax.lax.bitcast_convert_type(
        jax.random.bits(key, (1,), jnp.uint32), jnp.int32
    )
    q_flat = q_int.reshape(-1)

    # The adjacency / thresholds / seed are graph DATA, not differentiable
    # parameters: close over them so the custom_vjp signature never carries
    # them and no cotangent (913 MB of zeros at Decagon scale) is ever
    # constructed — correctness no longer leans on XLA DCE (advisor r4).
    @jax.custom_vjp
    def f(w, z):
        return _dense_bce_primal(w, z, dense_adj, q_flat, seed_arr)

    def fwd(w, z):
        return f(w, z), (w, z)

    def bwd(res, g):
        w, z = res
        dw, dz = _dense_bce_grads(w, z, dense_adj, q_flat, seed_arr)
        return (g * dw).astype(w.dtype), (g * dz).astype(z.dtype)

    f.defvjp(fwd, bwd)
    return f(w, z)


def _dense_bce_primal(w, z, dense_adj, q_flat, seed_arr):
    if _use_manual():
        out = _call_manual(
            _fwd_manual_kernel,
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            pl.BlockSpec((1, 1), lambda i, *sp: (0, 0),
                         memory_space=pltpu.SMEM),
            w, z, dense_adj, q_flat, seed_arr,
        )
        return out[0, 0]
    n_pad = -(-dense_adj.shape[0] // PAGES) * PAGES
    out = _call(
        _fwd_kernel,
        jax.ShapeDtypeStruct((n_pad, 1, 1), jnp.float32),
        pl.BlockSpec((PAGES, 1, 1), lambda i, *sp: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        w, z, dense_adj, q_flat, seed_arr,
    )
    return jnp.sum(out)


def _dense_bce_grads(w, z, dense_adj, q_flat, seed_arr):
    n_et = dense_adj.shape[0]
    d = z.shape[1]
    n1 = dense_adj.shape[1]
    # The backward keeps the AUTOMATIC grid pipeline on all backends: its
    # three per-page MXU dots overlap the next page's DMA there, while a
    # manual sequential ring measured SLOWER for the backward (3.8 -> 4.7
    # ms; the manual ring only wins on the DMA-dominated forward, 4.2 ->
    # 3.2 ms — runs/probe_dense_bce_manual.out).
    n_pad = -(-n_et // PAGES) * PAGES
    dw, dz = _call(
        _bwd_kernel,
        (
            jax.ShapeDtypeStruct((n_pad, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((n1, d), jnp.float32),
        ),
        (
            pl.BlockSpec((PAGES, 1, d), lambda i, *sp: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, d), lambda i, *sp: (0, 0),
                         memory_space=pltpu.VMEM),  # grid-accumulated
        ),
        w, z, dense_adj, q_flat, seed_arr,
    )
    return dw[:n_et, 0, :], dz[: z.shape[0]]


def dense_bce_sum_xla(w, z, dense_adj, q_int, seed, block: int = 128):
    """XLA reference/fallback of the SAME estimator (CPU path, oracle).

    Identical math and per-cell count distribution; the uniforms come from
    the jax threefry stream instead of the on-chip PRNG, so values are not
    bit-identical to the kernel — distributionally equivalent (the same
    contract as the chunked sampler's backend pair).  Blocked over
    relations with rematerialization, mirroring
    nn/decoders.py:distmult_dense_pos_bce_sum.
    """
    n_et, n1, n2 = dense_adj.shape  # may be tile-padded (pad_dense_adj)
    nt = z.shape[0]
    block = min(block, n_et)
    zc = jnp.pad(z, ((0, n1 - nt), (0, 0))).astype(jnp.float32)
    zc2 = jnp.pad(z, ((0, n2 - nt), (0, 0))).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
    valid = (row < nt) & (col < nt)
    mixed_ok = (
        dense_adj.dtype == jnp.float32 or jax.default_backend() != "cpu"
    )

    def block_sum(wb, da, qb, key, fresh):
        da = da.astype(jnp.float32)
        zw = zc[None] * wb.astype(jnp.float32)[:, None, :]
        if mixed_ok:
            logits = jnp.einsum(
                "tnf,mf->tnm", zw, zc2, preferred_element_type=jnp.float32
            )
        else:
            logits = jnp.einsum(
                "tnf,mf->tnm", zw.astype(jnp.float32), zc2.astype(jnp.float32)
            )
        sp = jax.nn.softplus(-logits)
        u24 = jax.lax.shift_right_logical(
            jax.random.bits(key, logits.shape, jnp.uint32).astype(jnp.int32)
            & jnp.int32(0x7FFFFFFF),
            7,
        )
        cnt = (u24[None] < qb.T[:, :, None, None]).astype(jnp.float32).sum(0)
        cnt = jnp.where((da > 0) | jnp.logical_not(valid), 0.0, cnt)
        val = sp * da + (sp + logits) * cnt
        return jnp.sum(val * fresh[:, None, None])

    block_sum = jax.checkpoint(block_sum)
    total = jnp.zeros((), jnp.float32)
    for i in range(-(-n_et // block)):
        start = min(i * block, n_et - block)
        fresh = jnp.asarray(
            (start + jnp.arange(block)) >= i * block, jnp.float32
        )
        total = total + block_sum(
            w[start:start + block],
            dense_adj[start:start + block],
            q_int[start:start + block],
            jax.random.fold_in(seed, i),
            fresh,
        )
    return total
