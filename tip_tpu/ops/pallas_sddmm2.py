"""Two-level-gather DistMult SDDMM — v2 of the fused decoder kernel.

The v1 kernel (ops/pallas_segment.py:distmult_logits_padded) gathers edge
endpoints with one-hot matmuls over the FULL node axis:

    zs [D, C] = zT [D, N] @ onehot(src)T [N, C]

With N = 645 the contraction spans ceil(645/128) = 6 MXU passes and the
free dim D = 16 fills 16/128 lanes — every useful FLOP drags ~48x of
systolic-array occupancy with it.  This version splits the node id into
(hi, lo) = (id // 128, id % 128) and gathers in two levels:

  1. a SINGLE-TILE one-hot matmul over lo against a re-packed embedding
     table z2T [NB*D, 128] with z2T[h*D + d, lo] = z[h*128 + lo, d]
     (all NB hi-blocks side by side on the sublane axis):

         GsT [NB*D, C] = z2T @ onehot(lo_src)T [128, C]

     — contraction = exactly one 128-row pass, lanes = the chunk axis
     (full), so the MXU does NB*D useful rows per pass instead of D;

  2. a VPU select over the NB hi-blocks:

         ZsT [D, C] = sum_h GsT[h*D:(h+1)*D, :] * (hi_src == h)

     — NB masked adds on [D, C] tiles (C on the lanes: no padding waste).

Net: per gather, 1 MXU tile-pass + a few VPU ops versus 6x8 underfilled
tile-passes — ~6x fewer systolic passes at Decagon scale.  The backward
scatter uses the same decomposition in reverse (expand dZ to hi-blocks,
one-hot matmul over lo back into z2T space) and reuses the forward's
gathered endpoint values as residuals instead of regathering.

Padding slots carry dst = n_nodes (data/packing.py:pad_typed_edges), which
lands on an all-zero row of the padded table, so padded logits are exactly
0.0 — the same contract as v1.

Replaces the reference decoder's per-edge gather-mul-reduce
(reference: src/layers.py:590-592) on the negative-edge path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _nb(n_nodes: int) -> int:
    """hi-blocks needed to address ids 0..n_nodes inclusive (the pad id)."""
    return n_nodes // LANE + 1


def pack_table_t(z, n_nodes: int):
    """z [n_nodes, D] -> z2T [NB*D, LANE], z2T[h*D+d, lo] = z[h*128+lo, d].

    Rows >= n_nodes (including the pad id n_nodes itself) are zero.
    """
    nb = _nb(n_nodes)
    d = z.shape[1]
    zp = jnp.zeros((nb * LANE, d), z.dtype).at[:n_nodes].set(z)
    return zp.reshape(nb, LANE, d).transpose(0, 2, 1).reshape(nb * d, LANE)


def unpack_table_t(z2t, n_nodes: int, d: int):
    """Inverse of pack_table_t (drops the zero pad rows)."""
    nb = _nb(n_nodes)
    return (
        z2t.reshape(nb, d, LANE).transpose(0, 2, 1).reshape(nb * LANE, d)[:n_nodes]
    )


def _hi_lo(ids):
    return jax.lax.shift_right_logical(ids, 7), jnp.bitwise_and(ids, LANE - 1)


def _oh_t(lo, dtype):
    """[C] int32 -> [LANE, C] transposed one-hot over the lo axis."""
    row = jax.lax.broadcasted_iota(jnp.int32, (LANE, lo.shape[0]), 0)
    return (row == lo[None, :]).astype(dtype)


def _gather2(z2t_ref, ids, nb: int, d: int, dtype):
    """ZT [D, C] = two-level gather of z rows at ``ids`` (transposed)."""
    hi, lo = _hi_lo(ids)
    gt = jnp.dot(z2t_ref[:], _oh_t(lo, dtype), preferred_element_type=jnp.float32)
    zt = jnp.zeros((d, ids.shape[0]), jnp.float32)
    for h in range(nb):
        zt = zt + gt[h * d:(h + 1) * d, :] * (hi == h)[None, :]
    return zt


def _dm2_fwd_kernel(nb, chunk_type_ref, src_ref, dst_ref, z2t_ref, w_ref,
                    out_ref, zs_ref, zd_ref):
    dtype = z2t_ref.dtype
    d = w_ref.shape[-1]
    zs = _gather2(z2t_ref, src_ref[0, 0, :], nb, d, dtype)  # [D, C] f32
    zd = _gather2(z2t_ref, dst_ref[0, 0, :], nb, d, dtype)
    w = w_ref[0, 0][:, None]  # [D, 1]
    out_ref[0, 0, :] = jnp.sum(zs * zd * w, axis=0)
    zs_ref[0] = zs.astype(dtype)
    zd_ref[0] = zd.astype(dtype)


def _dm2_fwd(z2t, w, src2d, dst2d, chunk_type, compute_dtype):
    n_chunks, chunk = src2d.shape
    nbd, _ = z2t.shape
    n_et, d = w.shape
    nb = nbd // d
    src3d = src2d.reshape(n_chunks, 1, chunk)
    dst3d = dst2d.reshape(n_chunks, 1, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z2t whole
            pl.BlockSpec((1, 1, d), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    cdt = jnp.dtype(compute_dtype)
    out3d, zs_all, zd_all = pl.pallas_call(
        functools.partial(_dm2_fwd_kernel, nb),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks, 1, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, d, chunk), cdt),
            jax.ShapeDtypeStruct((n_chunks, d, chunk), cdt),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_chunks * chunk * LANE * nbd,
            bytes_accessed=n_chunks * chunk * (12 + 4 * d),
            transcendentals=0,
        ),
    )(chunk_type, src3d, dst3d, z2t.astype(cdt), w.reshape(n_et, 1, d))
    return out3d.reshape(n_chunks, chunk), zs_all, zd_all


def _dm2_bwd_kernel(nb, chunk_type_ref, src_ref, dst_ref, g_ref, zs_ref,
                    zd_ref, w_ref, dz2t_ref, dwc_ref):
    i = pl.program_id(0)
    dtype = zs_ref.dtype
    g = g_ref[0, 0][None, :]  # [1, C]
    w = w_ref[0, 0][:, None]  # [D, 1]
    zs = zs_ref[0].astype(jnp.float32)  # [D, C]
    zd = zd_ref[0].astype(jnp.float32)

    # dz[src] += g * zd * w[t];  dz[dst] += g * zs * w[t] — in two-level
    # space: expand [D, C] to hi-blocks [NB*D, C], one-hot matmul over lo.
    dzs = g * zd * w  # [D, C]
    dzd = g * zs * w

    def scatter(ids, dzt):
        hi, lo = _hi_lo(ids)
        et = jnp.concatenate(
            [dzt * (hi == h)[None, :] for h in range(nb)], axis=0
        ).astype(dtype)  # [NB*D, C]
        oh = _oh_t(lo, dtype)  # [LANE, C]
        return jax.lax.dot_general(
            et, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [NB*D, LANE]

    contrib = scatter(src_ref[0, 0, :], dzs) + scatter(dst_ref[0, 0, :], dzd)

    @pl.when(i == 0)
    def _():
        dz2t_ref[:] = contrib

    @pl.when(i != 0)
    def _():
        dz2t_ref[:] += contrib

    # dw contribution is emitted PER CHUNK and segment-summed by relation in
    # XLA (wrapper): an in-kernel per-relation accumulator keyed on
    # "first visit of this relation" silently corrupts under shard_map,
    # where device-local chunk segments interleave pad chunks (local
    # relation 0) and may omit relations entirely — a re-triggered first
    # visit overwrites the accumulated row and unvisited output rows are
    # undefined memory that would be psum'd into real gradients.
    dwc_ref[0, 0, :] = jnp.sum(zs * zd * g, axis=1)  # [D]


def _dm2_bwd(zs_all, zd_all, w, src2d, dst2d, chunk_type, g2d, nb: int):
    n_chunks, chunk = src2d.shape
    n_et, d = w.shape
    src3d = src2d.reshape(n_chunks, 1, chunk)
    dst3d = dst2d.reshape(n_chunks, 1, chunk)
    g3d = g2d.reshape(n_chunks, 1, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nb * d, LANE), lambda i, ct: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    dz2t, dwc = pl.pallas_call(
        functools.partial(_dm2_bwd_kernel, nb),
        out_shape=(
            jax.ShapeDtypeStruct((nb * d, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, 1, d), jnp.float32),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_chunks * chunk * LANE * nb * d,
            bytes_accessed=n_chunks * chunk * (16 + 4 * d),
            transcendentals=0,
        ),
    )(chunk_type, src3d, dst3d, g3d, zs_all, zd_all, w.reshape(n_et, 1, d))
    # per-chunk dw -> per-relation dw, robust to ANY chunk_type order and
    # to relations absent from this device's shard (see kernel comment);
    # [n_chunks, d] is ~0.5 MB at Decagon scale — negligible.
    dw = jax.ops.segment_sum(
        dwc.reshape(n_chunks, d), chunk_type, num_segments=n_et
    )
    return dz2t, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def distmult_logits_padded2(z, w, src2d, dst2d, chunk_type, n_nodes,
                            compute_dtype=jnp.float32):
    """logits [n_chunks, chunk] for padded typed edges (padding rows give 0).

    Drop-in for ops/pallas_segment.py:distmult_logits_padded with the
    two-level gather/scatter decomposition (see module docstring).
    z: [n_nodes, d]; w: [n_et, d].
    """
    z2t = pack_table_t(z, n_nodes)
    out, _, _ = _dm2_fwd(z2t, w, src2d, dst2d, chunk_type, compute_dtype)
    return out


def _dm2_vjp_fwd(z, w, src2d, dst2d, chunk_type, n_nodes, compute_dtype):
    z2t = pack_table_t(z, n_nodes)
    out, zs_all, zd_all = _dm2_fwd(
        z2t, w, src2d, dst2d, chunk_type, compute_dtype
    )
    return out, (zs_all, zd_all, w, src2d, dst2d, chunk_type)


def _dm2_vjp_bwd(n_nodes, compute_dtype, res, g2d):
    zs_all, zd_all, w, src2d, dst2d, chunk_type = res
    d = w.shape[1]
    dz2t, dw = _dm2_bwd(
        zs_all, zd_all, w, src2d, dst2d, chunk_type,
        g2d.astype(jnp.float32), _nb(n_nodes),
    )
    return unpack_table_t(dz2t, n_nodes, d), dw, None, None, None


distmult_logits_padded2.defvjp(_dm2_vjp_fwd, _dm2_vjp_bwd)


# ---------------------------------------------------------------------------
# NN decoder with the same two-level gather/scatter decomposition
# ---------------------------------------------------------------------------
#
#   logits_e = sum_l h1[src_e, l] w1[et_e, l] + sum_l h2[dst_e, l] w2[et_e, l]
#
# (reference NNDecoder: src/layers.py:620-631).  Each endpoint term is half a
# DistMult SDDMM; the forward saves the gathered h1[src]/h2[dst] rows as
# residuals for dw, and the backward's dh scatters don't need them at all
# (dh1[src] += g * w1[t]).


def _nn2_fwd_kernel(nb, chunk_type_ref, src_ref, dst_ref, h1_ref, h2_ref,
                    w1_ref, w2_ref, out_ref, hs_ref, hd_ref):
    dtype = h1_ref.dtype
    d = w1_ref.shape[-1]
    hs = _gather2(h1_ref, src_ref[0, 0, :], nb, d, dtype)  # [L, C] f32
    hd = _gather2(h2_ref, dst_ref[0, 0, :], nb, d, dtype)
    out_ref[0, 0, :] = jnp.sum(
        hs * w1_ref[0, 0][:, None] + hd * w2_ref[0, 0][:, None], axis=0
    )
    hs_ref[0] = hs.astype(dtype)
    hd_ref[0] = hd.astype(dtype)


def _nn2_fwd(h1_2t, h2_2t, w1, w2, src2d, dst2d, chunk_type, compute_dtype):
    n_chunks, chunk = src2d.shape
    nbd, _ = h1_2t.shape
    n_et, d = w1.shape
    nb = nbd // d
    src3d = src2d.reshape(n_chunks, 1, chunk)
    dst3d = dst2d.reshape(n_chunks, 1, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h1_2t whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h2_2t whole
            pl.BlockSpec((1, 1, d), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    cdt = jnp.dtype(compute_dtype)
    out3d, hs_all, hd_all = pl.pallas_call(
        functools.partial(_nn2_fwd_kernel, nb),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks, 1, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, d, chunk), cdt),
            jax.ShapeDtypeStruct((n_chunks, d, chunk), cdt),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_chunks * chunk * LANE * nbd,
            bytes_accessed=n_chunks * chunk * (12 + 4 * d),
            transcendentals=0,
        ),
    )(
        chunk_type, src3d, dst3d, h1_2t.astype(cdt), h2_2t.astype(cdt),
        w1.reshape(n_et, 1, d), w2.reshape(n_et, 1, d),
    )
    return out3d.reshape(n_chunks, chunk), hs_all, hd_all


def _nn2_bwd_kernel(nb, chunk_type_ref, src_ref, dst_ref, g_ref, hs_ref,
                    hd_ref, w1_ref, w2_ref, dh1_ref, dh2_ref, dw1_ref, dw2_ref):
    i = pl.program_id(0)
    dtype = hs_ref.dtype
    g = g_ref[0, 0][None, :]  # [1, C]

    def scatter(ids, dht):
        hi, lo = _hi_lo(ids)
        et = jnp.concatenate(
            [dht * (hi == h)[None, :] for h in range(nb)], axis=0
        ).astype(dtype)
        oh = _oh_t(lo, dtype)
        return jax.lax.dot_general(
            et, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dh1 = scatter(src_ref[0, 0, :], g * w1_ref[0, 0][:, None])
    dh2 = scatter(dst_ref[0, 0, :], g * w2_ref[0, 0][:, None])

    @pl.when(i == 0)
    def _():
        dh1_ref[:] = dh1
        dh2_ref[:] = dh2

    @pl.when(i != 0)
    def _():
        dh1_ref[:] += dh1
        dh2_ref[:] += dh2

    # per-chunk dw, segment-summed by relation in XLA — see
    # _dm2_bwd_kernel for why the in-kernel per-relation accumulator is
    # unsafe under shard_map
    dw1_ref[0, 0, :] = jnp.sum(hs_ref[0].astype(jnp.float32) * g, axis=1)
    dw2_ref[0, 0, :] = jnp.sum(hd_ref[0].astype(jnp.float32) * g, axis=1)


def _nn2_bwd(hs_all, hd_all, w1, w2, src2d, dst2d, chunk_type, g2d, nb: int):
    n_chunks, chunk = src2d.shape
    n_et, d = w1.shape
    src3d = src2d.reshape(n_chunks, 1, chunk)
    dst3d = dst2d.reshape(n_chunks, 1, chunk)
    g3d = g2d.reshape(n_chunks, 1, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nb * d, LANE), lambda i, ct: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * d, LANE), lambda i, ct: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    dh1_2t, dh2_2t, dw1c, dw2c = pl.pallas_call(
        functools.partial(_nn2_bwd_kernel, nb),
        out_shape=(
            jax.ShapeDtypeStruct((nb * d, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb * d, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, 1, d), jnp.float32),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_chunks * chunk * LANE * nb * d,
            bytes_accessed=n_chunks * chunk * (16 + 4 * d),
            transcendentals=0,
        ),
    )(
        chunk_type, src3d, dst3d, g3d, hs_all, hd_all,
        w1.reshape(n_et, 1, d), w2.reshape(n_et, 1, d),
    )
    dw1 = jax.ops.segment_sum(
        dw1c.reshape(n_chunks, d), chunk_type, num_segments=n_et
    )
    dw2 = jax.ops.segment_sum(
        dw2c.reshape(n_chunks, d), chunk_type, num_segments=n_et
    )
    return dh1_2t, dh2_2t, dw1, dw2


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def nn_logits_padded2(h1, h2, w1, w2, src2d, dst2d, chunk_type, n_nodes,
                      compute_dtype=jnp.float32):
    """NN-decoder logits [n_chunks, chunk] via the two-level gather.

    Drop-in for ops/pallas_segment.py:nn_logits_padded; padding slots
    (dst = n_nodes) zero the dst term but the src term is real when the pad
    src is a valid id — the caller masks with the valid mask, the same
    contract as v1.
    """
    h1_2t = pack_table_t(h1, n_nodes)
    h2_2t = pack_table_t(h2, n_nodes)
    out, _, _ = _nn2_fwd(
        h1_2t, h2_2t, w1, w2, src2d, dst2d, chunk_type, compute_dtype
    )
    return out


def _nn2_vjp_fwd(h1, h2, w1, w2, src2d, dst2d, chunk_type, n_nodes,
                 compute_dtype):
    h1_2t = pack_table_t(h1, n_nodes)
    h2_2t = pack_table_t(h2, n_nodes)
    out, hs_all, hd_all = _nn2_fwd(
        h1_2t, h2_2t, w1, w2, src2d, dst2d, chunk_type, compute_dtype
    )
    return out, (hs_all, hd_all, w1, w2, src2d, dst2d, chunk_type)


def _nn2_vjp_bwd(n_nodes, compute_dtype, res, g2d):
    hs_all, hd_all, w1, w2, src2d, dst2d, chunk_type = res
    d = w1.shape[1]
    dh1_2t, dh2_2t, dw1, dw2 = _nn2_bwd(
        hs_all, hd_all, w1, w2, src2d, dst2d, chunk_type,
        g2d.astype(jnp.float32), _nb(n_nodes),
    )
    return (
        unpack_table_t(dh1_2t, n_nodes, d),
        unpack_table_t(dh2_2t, n_nodes, d),
        dw1, dw2, None, None, None,
    )


nn_logits_padded2.defvjp(_nn2_vjp_fwd, _nn2_vjp_bwd)
