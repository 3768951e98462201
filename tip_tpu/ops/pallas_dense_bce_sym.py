"""Symmetric-tile fused dense BCE: positives + Poissonized negatives over
the upper-block-triangle packed adjacency.

The DistMult logit tile of a relation is symmetric — L = (z ⊙ w_t) zᵀ = Lᵀ
— and so is its dense adjacency page (undirected edges are stored
mirrored, data/packing.py:split_typed_edges; reference src/utils.py:17-23).
The full-tile fused kernel (ops/pallas_dense_bce.py) therefore computes
every transcendental twice and streams every count twice.  This kernel
consumes the SYMMETRIC PACKED layout (data/packing.py:sym_block_pack:
``[R, NB, 128, 128]`` int8, NB = nb(nb+1)/2 upper-triangle blocks):

  * diagonal blocks (I == J) are processed as-is: every cell stands for
    itself, negatives draw at the single-cell rate (q8[:, :4]);
  * off-diagonal blocks (I < J) stand for themselves AND their mirror:
    the positive half is weighted 2x (softplus values at mirrored cells
    are equal), and ONE negative draw at the DOUBLED rate (q8[:, 4:])
    covers the cell pair — the pair's expected count and loss marginal
    match two independent single-rate draws exactly
    (data/packing.py:poisson_neg_thresholds_sym; validated in
    tests/test_dense_bce_sym.py).

Versus the full-tile kernel at Decagon scale: the HBM page stream drops
1.09 GB (tile-padded bf16) -> 377 MB (packed int8, upcast in-kernel —
counts are small integers, exact), and the per-page VPU cell count drops
648*768 -> 21*128^2 (~31%).  The loss being computed is the reference's
(reference: src/layers.py:338-340) under the same Poissonized estimator
as the full-tile kernel.

Sampling reproducibility mirrors pallas_dense_bce.py: the on-chip PRNG is
seeded per (step seed, relation) and the backward replays the forward's
block order, so counts are reproduced without materializing them.  Grads
flow to z and w only; the pages / thresholds / seed are closed over and
never receive a cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128  # block edge (data/packing.py:SYM_BLOCK)

# Manual-DMA ring depth for the per-relation page stream (the packed page
# is NB*16 KB contiguous; see runs/strip_probe_bce4.out for the full-tile
# pipeline study this inherits from).
NBUF = 8

# Relation pages per grid step of the automatic-pipeline driver (interpret
# mode / backward fallback) — same role as pallas_dense_bce.PAGES.
PAGES = 4


def _nb_from_pages(n_blk: int) -> int:
    nb = int(round(((8 * n_blk + 1) ** 0.5 - 1) / 2))
    if nb * (nb + 1) // 2 != n_blk:
        raise ValueError(f"{n_blk} is not a triangular block count")
    return nb


def _blocks(nb: int):
    return [(i, j) for i in range(nb) for j in range(i, nb)]


def _block_valid(i, j, nt: int):
    """Static validity mask of block (i, j) (None = fully valid)."""
    ri, rj = nt - i * B, nt - j * B
    if ri >= B and rj >= B:
        return None
    row = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    return (row < ri) & (col < rj)


def _page_math(nt, nb, q_ref, t, w_row, zb, page, grads: bool):
    """Loss (grads=False) or (dw_t row, dz block-updates) for one relation.

    ``page``: [NB, B, B] int8 ref/array of upper-triangle blocks.  The
    caller has seeded the PRNG for relation t; draws happen in static
    block order (identical forward and backward).
    """
    acc = jnp.zeros((), jnp.float32)
    dwt = jnp.zeros((1, w_row.shape[-1]), jnp.float32)
    dz_updates = []
    for k, (i, j) in enumerate(_blocks(nb)):
        da = page[k].astype(jnp.float32)
        zi = zb[i * B:(i + 1) * B]
        zj = zb[j * B:(j + 1) * B]
        logits = jax.lax.dot_general(  # (zi * w) @ zj^T, contract feature dim
            zi * w_row, zj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        u24 = jax.lax.shift_right_logical(
            pltpu.bitcast(pltpu.prng_random_bits((B, B)), jnp.int32), 8
        )
        off = 0 if i == j else 4
        cnt = jnp.zeros((B, B), jnp.float32)
        for kk in range(4):
            cnt = cnt + (u24 < q_ref[8 * t + off + kk]).astype(jnp.float32)
        valid = _block_valid(i, j, nt)
        bad = da > 0 if valid is None else (da > 0) | jnp.logical_not(valid)
        cnt = jnp.where(bad, jnp.float32(0), cnt)
        posw = 1.0 if i == j else 2.0
        if not grads:
            sp = jax.nn.softplus(-logits)
            acc = acc + jnp.sum(sp * (posw * da) + (sp + logits) * cnt)
            continue
        sg = jax.nn.sigmoid(-logits)
        g = cnt - sg * (posw * da + cnt)
        hi = jax.lax.dot_general(  # [B, d]: contract g's col axis with zj rows
            g, zj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hj = jax.lax.dot_general(  # [B, d]: contract g's row axis with zi rows
            g, zi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwt = dwt + jnp.sum(zi * hi, axis=0, keepdims=True)
        dz_updates.append((i, w_row * hi))
        dz_updates.append((j, w_row * hj))
    if not grads:
        return acc
    return dwt, dz_updates


def _fwd_manual_kernel(nt, nb, n_et, seed_ref, q_ref, w_ref, zb_ref,
                       pages_hbm, out_ref):
    zb = zb_ref[...]

    def body(scratch, sems):
        def dma(slot, page):
            return pltpu.make_async_copy(
                pages_hbm.at[page], scratch.at[slot], sems.at[slot]
            )

        for p in range(min(NBUF - 1, n_et)):
            dma(p, p).start()

        def loop(t, acc):
            nxt = t + NBUF - 1

            @pl.when(nxt < n_et)
            def _():
                dma(nxt % NBUF, nxt).start()

            dma(t % NBUF, t).wait()
            pltpu.prng_seed(seed_ref[0], t)
            return acc + _page_math(
                nt, nb, q_ref, t, w_ref[pl.ds(t, 1), 0, :], zb,
                scratch[t % NBUF], grads=False,
            )

        out_ref[0, 0] = jax.lax.fori_loop(0, n_et, loop, jnp.float32(0))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((NBUF,) + pages_hbm.shape[1:], pages_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((NBUF,)),
    )


def _bwd_manual_kernel(nt, nb, n_et, seed_ref, q_ref, w_ref, zb_ref,
                       pages_hbm, dw_ref, dz_ref):
    zb = zb_ref[...]
    dz_ref[...] = jnp.zeros_like(dz_ref)

    def body(scratch, sems):
        def dma(slot, page):
            return pltpu.make_async_copy(
                pages_hbm.at[page], scratch.at[slot], sems.at[slot]
            )

        for p in range(min(NBUF - 1, n_et)):
            dma(p, p).start()

        def loop(t, carry):
            nxt = t + NBUF - 1

            @pl.when(nxt < n_et)
            def _():
                dma(nxt % NBUF, nxt).start()

            dma(t % NBUF, t).wait()
            pltpu.prng_seed(seed_ref[0], t)
            w_row = w_ref[pl.ds(t, 1), 0, :]
            dwt, dz_updates = _page_math(
                nt, nb, q_ref, t, w_row, zb, scratch[t % NBUF], grads=True,
            )
            dw_ref[pl.ds(t, 1), 0, :] = dwt
            for i, upd in dz_updates:
                dz_ref[i * B:(i + 1) * B] += upd
            return carry

        jax.lax.fori_loop(0, n_et, loop, jnp.float32(0))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((NBUF,) + pages_hbm.shape[1:], pages_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((NBUF,)),
    )


def _fwd_auto_kernel(nt, nb, n_et, seed_ref, q_ref, w_ref, zb_ref, pages_ref,
                     out_ref):
    i = pl.program_id(0)
    zb = zb_ref[...]
    for p in range(PAGES):
        t = i * PAGES + p
        out_ref[p, 0, 0] = 0.0

        @pl.when(t < n_et)
        def _():
            pltpu.prng_seed(seed_ref[0], t)
            out_ref[p, 0, 0] = _page_math(
                nt, nb, q_ref, t, w_ref[p], zb, pages_ref[p], grads=False,
            )


def _bwd_auto_kernel(nt, nb, n_et, seed_ref, q_ref, w_ref, zb_ref, pages_ref,
                     dw_ref, dz_ref):
    i = pl.program_id(0)
    zb = zb_ref[...]

    @pl.when(i == 0)
    def _():
        dz_ref[...] = jnp.zeros_like(dz_ref)

    for p in range(PAGES):
        t = i * PAGES + p

        @pl.when(t < n_et)
        def _():
            pltpu.prng_seed(seed_ref[0], t)
            dwt, dz_updates = _page_math(
                nt, nb, q_ref, t, w_ref[p], zb, pages_ref[p], grads=True,
            )
            dw_ref[p, 0, :] = dwt[0]
            for bi, upd in dz_updates:
                dz_ref[bi * B:(bi + 1) * B] += upd


def _cost(n_et, n_blk, d):
    cells = n_et * n_blk * B * B
    return pl.CostEstimate(
        flops=2 * cells * (3 * d),
        bytes_accessed=cells + n_et * d * 4,
        transcendentals=cells,
    )


def _prep(w, z, sym_pages):
    n_et, n_blk = sym_pages.shape[:2]
    nt, d = z.shape
    nb = _nb_from_pages(n_blk)
    zb = jnp.pad(z.astype(jnp.float32), ((0, nb * B - nt), (0, 0)))
    w3 = w.astype(jnp.float32)[:, None, :]
    return n_et, n_blk, nt, d, nb, zb, w3


def _use_manual() -> bool:
    return jax.default_backend() == "tpu"


def _primal(w, z, sym_pages, q_flat, seed_arr):
    n_et, n_blk, nt, d, nb, zb, w3 = _prep(w, z, sym_pages)
    if _use_manual():
        out = pl.pallas_call(
            functools.partial(_fwd_manual_kernel, nt, nb, n_et),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((n_et, 1, d), lambda i, *sp: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nb * B, d), lambda i, *sp: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((1, 1), lambda i, *sp: (0, 0),
                                       memory_space=pltpu.SMEM),
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=_cost(n_et, n_blk, d),
        )(seed_arr, q_flat, w3, zb, sym_pages)
        return out[0, 0]
    n_grid = -(-n_et // PAGES)
    wpad = jnp.pad(w3, ((0, n_grid * PAGES - n_et), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_fwd_auto_kernel, nt, nb, n_et),
        out_shape=jax.ShapeDtypeStruct((n_grid * PAGES, 1, 1), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((PAGES, 1, d), lambda i, *sp: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb * B, d), lambda i, *sp: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PAGES, n_blk, B, B), lambda i, *sp: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((PAGES, 1, 1), lambda i, *sp: (i, 0, 0),
                                   memory_space=pltpu.SMEM),
        ),
        cost_estimate=_cost(n_et, n_blk, d),
    )(seed_arr, q_flat, wpad, zb, sym_pages)
    return jnp.sum(out)


def _grads(w, z, sym_pages, q_flat, seed_arr):
    n_et, n_blk, nt, d, nb, zb, w3 = _prep(w, z, sym_pages)
    if _use_manual():
        dw, dz = pl.pallas_call(
            functools.partial(_bwd_manual_kernel, nt, nb, n_et),
            out_shape=(
                jax.ShapeDtypeStruct((n_et, 1, d), jnp.float32),
                jax.ShapeDtypeStruct((nb * B, d), jnp.float32),
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((n_et, 1, d), lambda i, *sp: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nb * B, d), lambda i, *sp: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=(
                    pl.BlockSpec((n_et, 1, d), lambda i, *sp: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nb * B, d), lambda i, *sp: (0, 0),
                                 memory_space=pltpu.VMEM),
                ),
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=_cost(n_et, n_blk, d),
        )(seed_arr, q_flat, w3, zb, sym_pages)
        return dw[:, 0, :], dz[:nt]
    n_grid = -(-n_et // PAGES)
    wpad = jnp.pad(w3, ((0, n_grid * PAGES - n_et), (0, 0), (0, 0)))
    dw, dz = pl.pallas_call(
        functools.partial(_bwd_auto_kernel, nt, nb, n_et),
        out_shape=(
            jax.ShapeDtypeStruct((n_grid * PAGES, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((nb * B, d), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((PAGES, 1, d), lambda i, *sp: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb * B, d), lambda i, *sp: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PAGES, n_blk, B, B), lambda i, *sp: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((PAGES, 1, d), lambda i, *sp: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb * B, d), lambda i, *sp: (0, 0),
                             memory_space=pltpu.VMEM),  # grid-accumulated
            ),
        ),
        cost_estimate=_cost(n_et, n_blk, d),
    )(seed_arr, q_flat, wpad, zb, sym_pages)
    return dw[:n_et, 0, :], dz[:nt]


def dense_bce_sym_sum(w, z, sym_pages, q8, key):
    """Scalar positive + Poissonized-negative BCE sum (symmetric layout).

    w: [n_et, d]; z: [n, d]; sym_pages: [n_et, NB, 128, 128] int8
    (sym_block_pack); q8: [n_et, 8] int32 (poisson_neg_thresholds_sym);
    key: jax PRNG key.
    """
    seed_arr = jax.lax.bitcast_convert_type(
        jax.random.bits(key, (1,), jnp.uint32), jnp.int32
    )
    q_flat = q8.reshape(-1)

    @jax.custom_vjp
    def f(w, z):
        return _primal(w, z, sym_pages, q_flat, seed_arr)

    def fwd(w, z):
        return f(w, z), (w, z)

    def bwd(res, g):
        w, z = res
        dw, dz = _grads(w, z, sym_pages, q_flat, seed_arr)
        return (g * dw).astype(w.dtype), (g * dz).astype(z.dtype)

    f.defvjp(fwd, bwd)
    return f(w, z)


def dense_bce_sym_sum_xla(w, z, sym_pages, q8, key):
    """XLA reference/fallback of the SAME symmetric estimator (CPU path,
    shard_map dryrun, oracle for the kernel's math).

    Identical per-block structure, weights and count marginals; uniforms
    come from the jax threefry stream (fold_in per block) instead of the
    on-chip PRNG — distributionally equivalent, not bit-identical (the
    same contract as dense_bce_sum_xla vs the full-tile kernel).
    """
    n_et, n_blk = sym_pages.shape[:2]
    nt, d = z.shape
    nb = _nb_from_pages(n_blk)
    zb = jnp.pad(z.astype(jnp.float32), ((0, nb * B - nt), (0, 0)))
    wf = w.astype(jnp.float32)

    def block_sum(k, i, j, key_k):
        da = sym_pages[:, k].astype(jnp.float32)  # [R, B, B]
        zi = zb[i * B:(i + 1) * B]
        zj = zb[j * B:(j + 1) * B]
        logits = jnp.einsum(
            "nf,tf,mf->tnm", zi, wf, zj, preferred_element_type=jnp.float32
        )
        u24 = jax.lax.shift_right_logical(
            jax.random.bits(key_k, logits.shape, jnp.uint32).astype(jnp.int32)
            & jnp.int32(0x7FFFFFFF),
            7,
        )
        off = 0 if i == j else 4
        qb = q8[:, off:off + 4]  # [R, 4]
        cnt = (u24[None] < qb.T[:, :, None, None]).astype(jnp.float32).sum(0)
        valid = _block_valid(i, j, nt)
        bad = da > 0 if valid is None else (da > 0) | jnp.logical_not(valid)
        cnt = jnp.where(bad, 0.0, cnt)
        posw = 1.0 if i == j else 2.0
        sp = jax.nn.softplus(-logits)
        return jnp.sum(sp * (posw * da) + (sp + logits) * cnt)

    total = jnp.zeros((), jnp.float32)
    for k, (i, j) in enumerate(_blocks(nb)):
        total = total + jax.checkpoint(
            functools.partial(block_sum, k, i, j)
        )(jax.random.fold_in(key, k))
    return total
