"""Symmetric-strip fused dense BCE: positives + Poissonized negatives over
the upper-triangle strip-packed adjacency, with the backward FUSED into the
forward pass.

The DistMult logit tile of a relation is symmetric — L = (z ⊙ w_t) zᵀ = Lᵀ
— and so is its dense adjacency page (undirected edges are stored
mirrored, data/packing.py:split_typed_edges; reference src/utils.py:17-23).
This kernel consumes the STRIP-PACKED layout
(data/packing.py:sym_strip_pack: ``[R, 128, NB*128]`` int8): strip I is the
contiguous upper-triangle tail of block-row I, so each page needs one
[128, width] logits dot per block row instead of per 128x128 block (a
block-granular variant measured ~2x slower on both the MXU and the VPU).

Within a strip, the first 128 columns are the diagonal block — cells stand
for themselves and draw negatives at the single-cell rate (q8[:, :4]); the
remaining columns stand for themselves AND their mirrors — positives are
weighted 2x (softplus at mirrored cells is equal) and ONE draw at the
DOUBLED rate (q8[:, 4:]) covers the pair, preserving the pair's expected
count and loss marginal exactly
(data/packing.py:poisson_neg_thresholds_sym).

**Fused backward.**  The training step always follows the loss with its
gradient, and the backward must replay the page stream, the PRNG field and
the logits anyway.  Under ``jax.grad`` the custom_vjp fwd rule runs ONE
kernel producing (loss, dw, dz) — one 377 MB stream, one PRNG pass, one
transcendental pass (sigmoid(-x) = 1 - exp(-softplus(-x)) reuses the
softplus) — and saves the megabyte-scale (dw, dz) as residuals; the bwd
rule just scales them.  A value-only kernel serves undifferentiated calls
(eval probes).  Versus separate fwd + bwd full-tile kernels at Decagon
scale this halves both the HBM traffic and the elementwise work of the
loss.

The loss computed is the reference's (reference: src/layers.py:338-340)
under the same Poissonized estimator as ops/pallas_dense_bce.py; grads
flow to z and w only — pages / thresholds / seed are closed over and never
receive a cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128  # block edge (data/packing.py:SYM_BLOCK)

# Manual-DMA ring depth for the per-relation page stream (each packed page
# is NB*16 KB contiguous).
NBUF = 8

# Relation pages per grid step of the automatic-pipeline driver
# (interpret-mode tests / non-TPU backends).
PAGES = 4


def _nb_from_cols(totcols: int) -> int:
    n_blk = totcols // B
    nb = int(round(((8 * n_blk + 1) ** 0.5 - 1) / 2))
    if nb * (nb + 1) // 2 != n_blk or totcols % B:
        raise ValueError(f"{totcols} is not a triangular strip width")
    return nb


def _strip_off(nb: int, i: int) -> int:
    return (i * nb - i * (i - 1) // 2) * B


def _page_math(nt, nb, q_ref, t, w_row, zb, page, grads: bool):
    """One relation page in strip layout.

    page: [B, NB*B] int8 (value).  Returns loss, or (loss, dw_row,
    [(block_row, update)...]) with grads.  The caller has seeded the PRNG
    for relation t; draws happen in static strip order (the fused and
    value-only kernels share this function, so their streams agree)."""
    acc = jnp.zeros((), jnp.float32)
    dwt = jnp.zeros((1, w_row.shape[-1]), jnp.float32)
    dz_updates = []
    ragged = nt < nb * B
    for i in range(nb):
        s = (nb - i) * B
        off = _strip_off(nb, i)
        da = page[:, off:off + s].astype(jnp.float32)  # [B, s]
        zi = zb[i * B:(i + 1) * B]  # [B, d]
        zt = zb[i * B:]  # [s, d]
        logits = jax.lax.dot_general(  # (zi * w) @ zt^T, contract features
            zi * w_row, zt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        u24 = jax.lax.shift_right_logical(
            pltpu.bitcast(pltpu.prng_random_bits((B, s)), jnp.int32), 8
        )
        # Per-rate-class counts WITHOUT per-cell selects: the diagonal
        # block is the strip's first 128 columns (single rate, weight 1)
        # and the tail is everything after (doubled rate, weight 2) — lane
        # slices at the block boundary, one code path each.

        def counts(u, qoff):
            c = jnp.zeros(u.shape, jnp.float32)
            for kk in range(4):
                c = c + (u < q_ref[8 * t + qoff + kk]).astype(jnp.float32)
            return c

        cnt = jnp.concatenate(
            [counts(u24[:, :B], 0), counts(u24[:, B:], 4)], axis=1
        ) if s > B else counts(u24, 0)
        bad = da > 0
        if ragged:
            col = jax.lax.broadcasted_iota(jnp.int32, (B, s), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (B, s), 0)
            lim = nt - i * B
            bad = bad | (row >= lim) | (col >= lim)
        cnt = jnp.where(bad, jnp.float32(0), cnt)
        # positive weight: 1 on the diagonal block, 2 on the tail — fold
        # into da column-slices instead of a per-cell select
        daw = jnp.concatenate(
            [da[:, :B], 2.0 * da[:, B:]], axis=1
        ) if s > B else da
        sp = jax.nn.softplus(-logits)
        acc = acc + jnp.sum(sp * daw + (sp + logits) * cnt)
        if not grads:
            continue
        # sigmoid(-L) = 1 - exp(-softplus(-L)): one extra exp reuses the
        # softplus (a shared-exp + reciprocal/select variant measured
        # SLOWER — the VPU's exp is cheaper than the select chain)
        sg = 1.0 - jnp.exp(-sp)
        g = cnt - sg * (daw + cnt)
        hi = jax.lax.dot_general(  # [B, d]: contract strip cols with zt rows
            g, zt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hj = jax.lax.dot_general(  # [s, d]: contract strip rows with zi rows
            g, zi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwt = dwt + jnp.sum(zi * hi, axis=0, keepdims=True)
        dz_updates.append((i * B, i * B + B, w_row * hi))
        dz_updates.append((i * B, nb * B, w_row * hj))
    if not grads:
        return acc
    return acc, dwt, dz_updates


def _manual_kernel(nt, nb, n_et, grads, seed_ref, q_ref, w_ref, zb_ref,
                   pages_hbm, *out_refs):
    zb = zb_ref[...]
    if grads:
        loss_ref, dw_ref, dz_ref = out_refs
        dz_ref[...] = jnp.zeros_like(dz_ref)
    else:
        (loss_ref,) = out_refs

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
            w_row = w_ref[pl.ds(t, 1), 0, :]
            out = _page_math(nt, nb, q_ref, t, w_row, zb,
                             scratch[t % NBUF], grads)
            if not grads:
                return acc + out
            page_loss, dwt, dz_updates = out
            dw_ref[pl.ds(t, 1), 0, :] = dwt
            for lo, hi_, upd in dz_updates:
                dz_ref[lo:hi_] += upd
            return acc + page_loss

        loss_ref[0, 0] = jax.lax.fori_loop(0, n_et, loop, jnp.float32(0))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((NBUF,) + pages_hbm.shape[1:], pages_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((NBUF,)),
    )


def _auto_kernel(nt, nb, n_et, grads, seed_ref, q_ref, w_ref, zb_ref,
                 pages_ref, *out_refs):
    i = pl.program_id(0)
    zb = zb_ref[...]
    if grads:
        loss_ref, dw_ref, dz_ref = out_refs

        @pl.when(i == 0)
        def _():
            dz_ref[...] = jnp.zeros_like(dz_ref)
    else:
        (loss_ref,) = out_refs

    for p in range(PAGES):
        t = i * PAGES + p
        loss_ref[p, 0, 0] = 0.0

        @pl.when(t < n_et)
        def _():
            pltpu.prng_seed(seed_ref[0], t)
            out = _page_math(nt, nb, q_ref, t, w_ref[p], zb, pages_ref[p],
                             grads)
            if not grads:
                loss_ref[p, 0, 0] = out
            else:
                page_loss, dwt, dz_updates = out
                loss_ref[p, 0, 0] = page_loss
                dw_ref[p, 0, :] = dwt[0]
                for lo, hi_, upd in dz_updates:
                    dz_ref[lo:hi_] += upd


def _cost(n_et, totcols, d, grads):
    cells = n_et * B * totcols
    return pl.CostEstimate(
        flops=2 * cells * ((3 if grads else 1) * d),
        bytes_accessed=cells + n_et * d * 4,
        transcendentals=cells * (2 if grads else 1),
    )


def _prep(w, z, sym_pages):
    n_et, _, totcols = sym_pages.shape
    nt, d = z.shape
    nb = _nb_from_cols(totcols)
    zb = jnp.pad(z.astype(jnp.float32), ((0, nb * B - nt), (0, 0)))
    w3 = w.astype(jnp.float32)[:, None, :]
    return n_et, totcols, nt, d, nb, zb, w3


def _use_manual() -> bool:
    return jax.default_backend() == "tpu"


def _run(w, z, sym_pages, q_flat, seed_arr, grads: bool):
    n_et, totcols, nt, d, nb, zb, w3 = _prep(w, z, sym_pages)
    if _use_manual():
        out_shape = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        out_specs = [pl.BlockSpec((1, 1), lambda i, *sp: (0, 0),
                                  memory_space=pltpu.SMEM)]
        if grads:
            out_shape += [
                jax.ShapeDtypeStruct((n_et, 1, d), jnp.float32),
                jax.ShapeDtypeStruct((nb * B, d), jnp.float32),
            ]
            out_specs += [
                pl.BlockSpec((n_et, 1, d), lambda i, *sp: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb * B, d), lambda i, *sp: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
        out = pl.pallas_call(
            functools.partial(_manual_kernel, nt, nb, n_et, grads),
            out_shape=tuple(out_shape),
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
                out_specs=tuple(out_specs),
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=_cost(n_et, totcols, d, grads),
        )(seed_arr, q_flat, w3, zb, sym_pages)
        if not grads:
            return out[0][0, 0]
        return out[0][0, 0], out[1][:, 0, :], out[2][:nt]
    n_grid = -(-n_et // PAGES)
    wpad = jnp.pad(w3, ((0, n_grid * PAGES - n_et), (0, 0), (0, 0)))
    out_shape = [jax.ShapeDtypeStruct((n_grid * PAGES, 1, 1), jnp.float32)]
    out_specs = [pl.BlockSpec((PAGES, 1, 1), lambda i, *sp: (i, 0, 0),
                              memory_space=pltpu.SMEM)]
    if grads:
        out_shape += [
            jax.ShapeDtypeStruct((n_grid * PAGES, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((nb * B, d), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((PAGES, 1, d), lambda i, *sp: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * B, d), lambda i, *sp: (0, 0),
                         memory_space=pltpu.VMEM),  # grid-accumulated
        ]
    out = pl.pallas_call(
        functools.partial(_auto_kernel, nt, nb, n_et, grads),
        out_shape=tuple(out_shape),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((PAGES, 1, d), lambda i, *sp: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb * B, d), lambda i, *sp: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PAGES, B, totcols), lambda i, *sp: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(out_specs),
        ),
        cost_estimate=_cost(n_et, totcols, d, grads),
    )(seed_arr, q_flat, wpad, zb, sym_pages)
    if not grads:
        return jnp.sum(out[0])
    return jnp.sum(out[0]), out[1][:n_et, 0, :], out[2][:nt]


def dense_bce_sym_sum(w, z, sym_pages, q8, key):
    """Scalar positive + Poissonized-negative BCE sum (symmetric strips).

    w: [n_et, d]; z: [n, d]; sym_pages: [n_et, 128, NB*128] int8
    (sym_strip_pack); q8: [n_et, 8] int32 (poisson_neg_thresholds_sym);
    key: jax PRNG key.  Under jax.grad the fwd rule computes (loss, dw,
    dz) in ONE fused kernel pass (see module docstring).
    """
    seed_arr = jax.lax.bitcast_convert_type(
        jax.random.bits(key, (1,), jnp.uint32), jnp.int32
    )
    q_flat = q8.reshape(-1)
    wdt, zdt = w.dtype, z.dtype  # static; closed over (not a residual)

    @jax.custom_vjp
    def f(w, z):
        return _run(w, z, sym_pages, q_flat, seed_arr, grads=False)

    def fwd(w, z):
        val, dw, dz = _run(w, z, sym_pages, q_flat, seed_arr, grads=True)
        return val, (dw, dz)

    def bwd(res, g):
        dw, dz = res
        return (g * dw).astype(wdt), (g * dz).astype(zdt)

    f.defvjp(fwd, bwd)
    return f(w, z)


def dense_bce_sym_sum_xla(w, z, sym_pages, q8, key):
    """XLA reference/fallback of the SAME symmetric estimator (CPU path,
    shard_map dryrun, oracle for the kernel's math).

    Identical strip structure, weights and count marginals; uniforms come
    from the jax threefry stream (fold_in per strip) instead of the
    on-chip PRNG — distributionally equivalent, not bit-identical (the
    same contract as dense_bce_sum_xla vs the full-tile kernel).
    """
    n_et, _, totcols = sym_pages.shape
    nt, d = z.shape
    nb = _nb_from_cols(totcols)
    zb = jnp.pad(z.astype(jnp.float32), ((0, nb * B - nt), (0, 0)))
    wf = w.astype(jnp.float32)
    ragged = nt < nb * B

    def strip_sum(i, key_i):
        s = (nb - i) * B
        off = _strip_off(nb, i)
        da = sym_pages[:, :, off:off + s].astype(jnp.float32)  # [R, B, s]
        zi = zb[i * B:(i + 1) * B]
        zt = zb[i * B:]
        logits = jnp.einsum(
            "nf,tf,mf->tnm", zi, wf, zt, preferred_element_type=jnp.float32
        )
        u24 = jax.lax.shift_right_logical(
            jax.random.bits(key_i, logits.shape, jnp.uint32).astype(jnp.int32)
            & jnp.int32(0x7FFFFFFF),
            7,
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (B, s), 1)
        diag = (col < B)[None]
        q_cell = jnp.where(
            diag[None], q8[:, :4].T[:, :, None, None],
            q8[:, 4:].T[:, :, None, None],
        )  # [4, R, B, s] per-cell thresholds by rate class
        cnt = (u24[None] < q_cell).astype(jnp.float32).sum(0)
        bad = da > 0
        if ragged:
            row = jax.lax.broadcasted_iota(jnp.int32, (B, s), 0)
            lim = nt - i * B
            bad = bad | ((row >= lim) | (col >= lim))[None]
        cnt = jnp.where(bad, 0.0, cnt)
        posw = jnp.where(diag, 1.0, 2.0)
        sp = jax.nn.softplus(-logits)
        return jnp.sum(sp * (posw * da) + (sp + logits) * cnt)

    total = jnp.zeros((), jnp.float32)
    for i in range(nb):
        total = total + jax.checkpoint(functools.partial(strip_sum, i))(
            jax.random.fold_in(key, i)
        )
    return total
