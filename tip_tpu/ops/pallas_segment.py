"""Pallas TPU kernels for the sparse aggregation ops.

TPUs have no fast random scatter; these kernels turn gather+scatter into
dense one-hot matmuls on the MXU over chunk-aligned edge buffers
(data/packing.py:pad_typed_edges): edges are processed in chunks of C that
never straddle a relation bin, destinations are one-hot encoded against the
node axis, and

    P[t]  +=  onehot(dst_chunk)^T @ ( onehot(src_chunk) @ X )

accumulates each chunk's contribution with two [C, N] x [N, D] matmuls —
~2*N multiply-accumulates per edge-feature, which beats a serialized
scatter by orders of magnitude on this hardware.  Output blocks are revisited
across consecutive chunks of the same relation (the grid is type-ordered),
staying resident in VMEM and flushing to HBM once per relation.

Padded slots carry ``dst = n_nodes`` — one past the valid node range — so
their one-hot rows are all-zero and they contribute nothing (no masking
pass needed).

The custom VJP reuses the same kernel structure with gather/scatter roles
swapped: dX += onehot(src)^T @ ( onehot(dst) @ dP[t] ), reading the
cotangent block of the chunk's relation via a scalar-prefetched index map.

This module is the TPU replacement for what the reference obtains from
torch-scatter's CUDA scatter_mean (reference: src/layers.py:42,123,202 via
PyG MessagePassing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_CHUNK = 512


def _onehot(ids, n, dtype):
    """[C] int32 -> [C, n] one-hot; ids == n (padding) yield zero rows."""
    col = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], n), 1)
    return (col == ids[:, None]).astype(dtype)


def _onehot_t(ids, n, dtype):
    """[C] int32 -> [n, C] transposed one-hot (built directly, no transpose)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, ids.shape[0]), 0)
    return (row == ids[None, :]).astype(dtype)


# ---------------------------------------------------------------------------
# Forward: P[t, d, :] = sum_{e in relation t, dst_e = d} x[src_e]
# ---------------------------------------------------------------------------


def _tns_fwd_kernel(chunk_type_ref, src_ref, dst_ref, xt_ref, out_ref):
    # TRANSPOSED layout: xt [d, n], output block [1, d, n].  Feature dims
    # here are 16-64 — putting them on the 128-wide lanes (the [C, N]x[N, D]
    # orientation) wastes 50-87% of the MXU; with the node/chunk axes on the
    # lanes both matmuls run full width (same trick as the DistMult kernel).
    i = pl.program_id(0)
    t = chunk_type_ref[i]
    prev_t = chunk_type_ref[jnp.maximum(i - 1, 0)]
    first_visit = jnp.logical_or(i == 0, prev_t != t)

    n = xt_ref.shape[1]
    src = src_ref[0, 0, :]
    dst = dst_ref[0, 0, :]
    dtype = xt_ref.dtype
    gathered = jnp.dot(  # [d, C]
        xt_ref[:], _onehot_t(src, n, dtype), preferred_element_type=jnp.float32
    )
    contrib = jnp.dot(  # [d, n]
        gathered.astype(dtype), _onehot(dst, n, dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(first_visit)
    def _():
        out_ref[0] = contrib

    @pl.when(jnp.logical_not(first_visit))
    def _():
        out_ref[0] += contrib


def _tns_fwd(xt, src2d, dst2d, chunk_type, n_et: int):
    n_chunks, chunk = src2d.shape
    d, n = xt.shape
    # Mosaic block rule: last two dims divisible by (8, 128) or equal to the
    # array dims — per-chunk rows are lifted to [n_chunks, 1, chunk] so the
    # (1, 1, chunk) block matches the trailing array dims exactly.
    src3d = src2d.reshape(n_chunks, 1, chunk)
    dst3d = dst2d.reshape(n_chunks, 1, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xt, whole array
        ],
        out_specs=pl.BlockSpec(
            (1, d, n), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM
        ),
    )
    flops = 2 * 2 * n_chunks * chunk * n * d
    return pl.pallas_call(
        _tns_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n_et, d, n), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n_et * n * d * 4, transcendentals=0
        ),
    )(chunk_type, src3d, dst3d, xt)


# ---------------------------------------------------------------------------
# Backward (w.r.t. x): dX[s, :] += sum_t sum_{e in t, src_e = s} dP[t, dst_e, :]
# ---------------------------------------------------------------------------


def _tns_bwd_kernel(chunk_type_ref, src_ref, dst_ref, dpt_ref, out_ref):
    # transposed like the forward: dpt block [1, d, n], dxt out [d, n]
    i = pl.program_id(0)
    src = src_ref[0, 0, :]
    dst = dst_ref[0, 0, :]
    dtype = dpt_ref.dtype
    n = out_ref.shape[1]
    # gather cotangent rows of this chunk's relation at dst, scatter to src
    g = jnp.dot(  # [d, C]
        dpt_ref[0], _onehot_t(dst, n, dtype), preferred_element_type=jnp.float32
    )
    contrib = jnp.dot(  # [d, n]
        g.astype(dtype), _onehot(src, n, dtype), preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(i != 0)
    def _():
        out_ref[:] += contrib


def _tns_bwd(dpt, src2d, dst2d, chunk_type):
    n_chunks, chunk = src2d.shape
    n_et, d, n = dpt.shape
    src3d = src2d.reshape(n_chunks, 1, chunk)
    dst3d = dst2d.reshape(n_chunks, 1, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, n), lambda i, ct: (0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _tns_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((d, n), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_chunks * chunk * n * d,
            bytes_accessed=n_et * n * d * 4,
            transcendentals=0,
        ),
    )(chunk_type, src3d, dst3d, dpt)


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def typed_neighbor_sum_padded_t(x, src2d, dst2d, chunk_type, n_et,
                                compute_dtype=jnp.float32):
    """Pallas version of ops.segment.typed_neighbor_sum over padded chunks,
    in TRANSPOSED output layout.

    x: [n_nodes, d]; src2d/dst2d: [n_chunks, chunk] int32 (padding rows have
    dst = n_nodes); chunk_type: [n_chunks] int32 relation per chunk,
    non-decreasing.  Returns P^T [n_et, d, n_nodes] float32 — the node axis
    rides the 128-wide lanes inside the kernel (d is 16-64 here; the
    un-transposed orientation wastes 50-87% of the MXU), and the consumer's
    basis einsums contract the transposed layout directly (nn/rgcn.py).
    With compute_dtype=bfloat16 the one-hot matmul inputs are cast (one-hots
    are exact; x loses 8 mantissa bits) while accumulation stays float32.
    """
    return _tns_fwd(x.T.astype(compute_dtype), src2d, dst2d, chunk_type, n_et)


def _tns_vjp_fwd(x, src2d, dst2d, chunk_type, n_et, compute_dtype):
    return (
        _tns_fwd(x.T.astype(compute_dtype), src2d, dst2d, chunk_type, n_et),
        (src2d, dst2d, chunk_type),
    )


def _tns_vjp_bwd(n_et, compute_dtype, res, dpt):
    src2d, dst2d, chunk_type = res
    dxt = _tns_bwd(dpt.astype(compute_dtype), src2d, dst2d, chunk_type)
    return dxt.T, None, None, None


typed_neighbor_sum_padded_t.defvjp(_tns_vjp_fwd, _tns_vjp_bwd)


# ---------------------------------------------------------------------------
# Windowed scatter-sum SpMM for the P-P GCN
# ---------------------------------------------------------------------------
#
# The protein graph has 19k destinations — too many for one one-hot — so
# destinations are tiled into windows of W rows (data/packing.py:
# pad_windowed_edges) and each chunk scatters into its window's [W, D]
# block:   out[win] += onehot(dst_local)^T @ msgs_chunk.
# Messages (x[src] * weight) are gathered by XLA outside the kernel.


def _wscatter_kernel(chunk_window_ref, dstl_ref, msgs_ref, out_ref):
    i = pl.program_id(0)
    w = chunk_window_ref[i]
    prev_w = chunk_window_ref[jnp.maximum(i - 1, 0)]
    first_visit = jnp.logical_or(i == 0, prev_w != w)
    window = out_ref.shape[0]
    contrib = jnp.dot(
        _onehot_t(dstl_ref[0, 0, :], window, msgs_ref.dtype),
        msgs_ref[0],
        preferred_element_type=jnp.float32,
    )

    @pl.when(first_visit)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(first_visit))
    def _():
        out_ref[:] += contrib


def _windowed_scatter(msgs, dstl2d, chunk_window, n_windows: int, window: int):
    n_chunks, chunk, d = msgs.shape
    dstl3d = dstl2d.reshape(n_chunks, 1, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, cw: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d), lambda i, cw: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (window, d), lambda i, cw: (cw[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _wscatter_kernel,
        out_shape=jax.ShapeDtypeStruct((n_windows * window, d), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * chunk * window * d,
            bytes_accessed=msgs.size * 4 + n_windows * window * d * 4,
            transcendentals=0,
        ),
    )(chunk_window, dstl3d, msgs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def gcn_spmm_padded(x, src2d, dstl2d, w2d, chunk_window, n_windows, window,
                    n_nodes, compute_dtype=jnp.float32):
    """out = A_hat @ x over a windowed, chunk-aligned edge buffer.

    REQUIRES a symmetric normalized adjacency (true for GCN's
    D^-1/2 (A+I) D^-1/2 on an undirected graph): the backward pass computes
    dx = A_hat^T @ dout = A_hat @ dout by re-running the same kernel.
    """
    msgs = (x[src2d] * w2d[..., None]).astype(compute_dtype)
    out = _windowed_scatter(msgs, dstl2d, chunk_window, n_windows, window)
    return out[:n_nodes]


def _gcn_spmm_fwd(x, src2d, dstl2d, w2d, chunk_window, n_windows, window,
                  n_nodes, compute_dtype):
    out = gcn_spmm_padded(
        x, src2d, dstl2d, w2d, chunk_window, n_windows, window, n_nodes,
        compute_dtype,
    )
    return out, (src2d, dstl2d, w2d, chunk_window)


def _gcn_spmm_bwd(n_windows, window, n_nodes, compute_dtype, res, dout):
    src2d, dstl2d, w2d, chunk_window = res
    dx = gcn_spmm_padded(
        dout.astype(jnp.float32), src2d, dstl2d, w2d, chunk_window,
        n_windows, window, n_nodes, compute_dtype,
    )
    return dx, None, None, None, None


gcn_spmm_padded.defvjp(_gcn_spmm_fwd, _gcn_spmm_bwd)


# ---------------------------------------------------------------------------
# Fused DistMult decoder (SDDMM): logits_e = sum_d z[src]z[dst]w[et]
# ---------------------------------------------------------------------------
#
# The decoder feature dim is small (16), so gathers run in TRANSPOSED layout:
#   zsT [D, C] = zT [D, N] @ onehot(src)^T [N, C]
# putting the chunk axis on the 128-wide lanes and D on sublanes — full MXU
# utilization where the [C, N] x [N, D] orientation would use D/128 of the
# lanes.  Forward emits logits; backward scatters dz (accumulated across all
# chunks) and dw (accumulated per relation block) with the same matmuls
# reversed.  Replaces the reference decoder's gather-mul-reduce plus its
# autograd scatter (reference: src/layers.py:590-592).


def _distmult_fwd_kernel(chunk_type_ref, src_ref, dst_ref, zt_ref, w_ref, out_ref):
    dtype = zt_ref.dtype  # compute dtype; w_ref stays f32 (see wrapper)
    n = zt_ref.shape[1]
    oh_src_t = _onehot_t(src_ref[0, 0, :], n, dtype)  # [N, C]
    oh_dst_t = _onehot_t(dst_ref[0, 0, :], n, dtype)
    zs = jnp.dot(zt_ref[:], oh_src_t, preferred_element_type=jnp.float32)  # [D, C]
    zd = jnp.dot(zt_ref[:], oh_dst_t, preferred_element_type=jnp.float32)
    prod = zs * zd * w_ref[0, 0][:, None]  # [D, C]
    out_ref[0, 0, :] = jnp.sum(prod, axis=0)


def _distmult_fwd(zt, w, src2d, dst2d, chunk_type):
    n_chunks, chunk = src2d.shape
    d, n = zt.shape
    src3d = src2d.reshape(n_chunks, 1, chunk)
    dst3d = dst2d.reshape(n_chunks, 1, chunk)
    w3d = w.reshape(w.shape[0], 1, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # zt whole
            pl.BlockSpec((1, 1, d), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out3d = pl.pallas_call(
        _distmult_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 1, chunk), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_chunks * chunk * n * d,
            bytes_accessed=n_chunks * chunk * 12,
            transcendentals=0,
        ),
    )(chunk_type, src3d, dst3d, zt, w3d)
    return out3d.reshape(n_chunks, chunk)


def _distmult_bwd_kernel(
    chunk_type_ref, src_ref, dst_ref, g_ref, zt_ref, w_ref, dzt_ref, dw_ref
):
    i = pl.program_id(0)
    t = chunk_type_ref[i]
    prev_t = chunk_type_ref[jnp.maximum(i - 1, 0)]
    first_visit = jnp.logical_or(i == 0, prev_t != t)
    dtype = zt_ref.dtype
    n = zt_ref.shape[1]
    src = src_ref[0, 0, :]
    dst = dst_ref[0, 0, :]
    oh_src_t = _onehot_t(src, n, dtype)  # [N, C]
    oh_dst_t = _onehot_t(dst, n, dtype)
    zs = jnp.dot(zt_ref[:], oh_src_t, preferred_element_type=jnp.float32)  # [D, C]
    zd = jnp.dot(zt_ref[:], oh_dst_t, preferred_element_type=jnp.float32)
    g = g_ref[0, 0][None, :]  # [1, C]
    wcol = w_ref[0, 0][:, None]  # [D, 1]

    # dz scatters: dz[src] += g * zd * w[t]; dz[dst] += g * zs * w[t]
    # (one-hots built directly in each orientation — no in-kernel transpose)
    oh_src = _onehot(src, n, dtype)  # [C, N]
    oh_dst = _onehot(dst, n, dtype)
    a = (zd * wcol * g).astype(dtype)  # [D, C]
    b = (zs * wcol * g).astype(dtype)
    contrib = jnp.dot(a, oh_src, preferred_element_type=jnp.float32) + jnp.dot(
        b, oh_dst, preferred_element_type=jnp.float32
    )  # [D, N]

    @pl.when(i == 0)
    def _():
        dzt_ref[:] = contrib

    @pl.when(i != 0)
    def _():
        dzt_ref[:] += contrib

    # dw[t] += sum_e g * zs * zd
    dw_contrib = jnp.sum(zs * zd * g, axis=1)  # [D]

    @pl.when(first_visit)
    def _():
        dw_ref[0, 0, :] = dw_contrib

    @pl.when(jnp.logical_not(first_visit))
    def _():
        dw_ref[0, 0, :] += dw_contrib


def _distmult_bwd(zt, w, src2d, dst2d, chunk_type, g2d):
    n_chunks, chunk = src2d.shape
    d, n = zt.shape
    n_et = w.shape[0]
    src3d = src2d.reshape(n_chunks, 1, chunk)
    dst3d = dst2d.reshape(n_chunks, 1, chunk)
    g3d = g2d.reshape(n_chunks, 1, chunk)
    w3d = w.reshape(n_et, 1, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # zt
            pl.BlockSpec((1, 1, d), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, n), lambda i, ct: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    dzt, dw3d = pl.pallas_call(
        _distmult_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((d, n), jnp.float32),
            jax.ShapeDtypeStruct((n_et, 1, d), jnp.float32),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * n_chunks * chunk * n * d,
            bytes_accessed=n_chunks * chunk * 16,
            transcendentals=0,
        ),
    )(chunk_type, src3d, dst3d, g3d, zt, w3d)
    return dzt, dw3d.reshape(n_et, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def distmult_logits_padded(z, w, src2d, dst2d, chunk_type,
                           compute_dtype=jnp.float32):
    """logits [n_chunks, chunk] for padded typed edges (padding rows give 0).

    z: [n_nodes, d]; w: [n_et, d] per-relation diagonal.
    """
    return _distmult_fwd(z.T.astype(compute_dtype), w, src2d, dst2d, chunk_type)


def _distmult_vjp_fwd(z, w, src2d, dst2d, chunk_type, compute_dtype):
    zt = z.T.astype(compute_dtype)
    return _distmult_fwd(zt, w, src2d, dst2d, chunk_type), (
        zt, w, src2d, dst2d, chunk_type,
    )


def _distmult_vjp_bwd(compute_dtype, res, g2d):
    zt, w, src2d, dst2d, chunk_type = res
    dzt, dw = _distmult_bwd(zt, w, src2d, dst2d, chunk_type,
                            g2d.astype(jnp.float32))
    return dzt.T, dw, None, None, None


distmult_logits_padded.defvjp(_distmult_vjp_fwd, _distmult_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused NN decoder edge scoring
# ---------------------------------------------------------------------------
#
# The reference NNDecoder (src/layers.py:598-631) scores an edge as
#   logits_e = sum_l relu(z W1)[src_e, l] w1[et_e, l]
#            + sum_l relu(z W2)[dst_e, l] w2[et_e, l]
# The dense L1 projections + relu stay in XLA (two [n_drug, l1] matmuls);
# the per-edge part is two half-DistMult SDDMMs sharing the DistMult
# kernel's transposed layout: h^T [L, N] @ onehot(idx)^T [N, C] puts the
# chunk axis on the lanes.  This removes the [E, l1] gather intermediates
# the XLA path materializes (8x-padded on TPU).


def _nn_fwd_kernel(
    chunk_type_ref, src_ref, dst_ref, h1t_ref, h2t_ref, w1_ref, w2_ref, out_ref
):
    dtype = h1t_ref.dtype
    n = h1t_ref.shape[1]
    hs = jnp.dot(
        h1t_ref[:], _onehot_t(src_ref[0, 0, :], n, dtype),
        preferred_element_type=jnp.float32,
    )  # [L, C]
    hd = jnp.dot(
        h2t_ref[:], _onehot_t(dst_ref[0, 0, :], n, dtype),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0, :] = jnp.sum(
        hs * w1_ref[0, 0][:, None] + hd * w2_ref[0, 0][:, None], axis=0
    )


def _nn_fwd(h1t, h2t, w1, w2, src2d, dst2d, chunk_type):
    n_chunks, chunk = src2d.shape
    l1, n = h1t.shape
    n_et = w1.shape[0]
    src3d = src2d.reshape(n_chunks, 1, chunk)
    dst3d = dst2d.reshape(n_chunks, 1, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h1t whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h2t whole
            pl.BlockSpec((1, 1, l1), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l1), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out3d = pl.pallas_call(
        _nn_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 1, chunk), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_chunks * chunk * n * l1,
            bytes_accessed=n_chunks * chunk * 12,
            transcendentals=0,
        ),
    )(
        chunk_type, src3d, dst3d, h1t, h2t,
        w1.reshape(n_et, 1, l1), w2.reshape(n_et, 1, l1),
    )
    return out3d.reshape(n_chunks, chunk)


def _nn_bwd_kernel(
    chunk_type_ref, src_ref, dst_ref, g_ref, h1t_ref, h2t_ref, w1_ref, w2_ref,
    dh1t_ref, dh2t_ref, dw1_ref, dw2_ref,
):
    i = pl.program_id(0)
    t = chunk_type_ref[i]
    prev_t = chunk_type_ref[jnp.maximum(i - 1, 0)]
    first_visit = jnp.logical_or(i == 0, prev_t != t)
    dtype = h1t_ref.dtype
    n = h1t_ref.shape[1]
    src = src_ref[0, 0, :]
    dst = dst_ref[0, 0, :]
    g = g_ref[0, 0][None, :]  # [1, C]

    # dh scatters: dh1[src] += g * w1[t]; dh2[dst] += g * w2[t]
    a = (w1_ref[0, 0][:, None] * g).astype(dtype)  # [L, C]
    b = (w2_ref[0, 0][:, None] * g).astype(dtype)
    dh1 = jnp.dot(a, _onehot(src, n, dtype), preferred_element_type=jnp.float32)
    dh2 = jnp.dot(b, _onehot(dst, n, dtype), preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dh1t_ref[:] = dh1
        dh2t_ref[:] = dh2

    @pl.when(i != 0)
    def _():
        dh1t_ref[:] += dh1
        dh2t_ref[:] += dh2

    # dw gathers: dw1[t] += sum_e g * h1[src]; dw2[t] += sum_e g * h2[dst]
    hs = jnp.dot(
        h1t_ref[:], _onehot_t(src, n, dtype), preferred_element_type=jnp.float32
    )
    hd = jnp.dot(
        h2t_ref[:], _onehot_t(dst, n, dtype), preferred_element_type=jnp.float32
    )
    dw1 = jnp.sum(hs * g, axis=1)
    dw2 = jnp.sum(hd * g, axis=1)

    @pl.when(first_visit)
    def _():
        dw1_ref[0, 0, :] = dw1
        dw2_ref[0, 0, :] = dw2

    @pl.when(jnp.logical_not(first_visit))
    def _():
        dw1_ref[0, 0, :] += dw1
        dw2_ref[0, 0, :] += dw2


def _nn_bwd(h1t, h2t, w1, w2, src2d, dst2d, chunk_type, g2d):
    n_chunks, chunk = src2d.shape
    l1, n = h1t.shape
    n_et = w1.shape[0]
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h1t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h2t
            pl.BlockSpec((1, 1, l1), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l1), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((l1, n), lambda i, ct: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l1, n), lambda i, ct: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l1), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l1), lambda i, ct: (ct[i], 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    dh1t, dh2t, dw13d, dw23d = pl.pallas_call(
        _nn_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((l1, n), jnp.float32),
            jax.ShapeDtypeStruct((l1, n), jnp.float32),
            jax.ShapeDtypeStruct((n_et, 1, l1), jnp.float32),
            jax.ShapeDtypeStruct((n_et, 1, l1), jnp.float32),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * n_chunks * chunk * n * l1,
            bytes_accessed=n_chunks * chunk * 16,
            transcendentals=0,
        ),
    )(
        chunk_type, src3d, dst3d, g3d, h1t, h2t,
        w1.reshape(n_et, 1, l1), w2.reshape(n_et, 1, l1),
    )
    return dh1t, dh2t, dw13d.reshape(n_et, l1), dw23d.reshape(n_et, l1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def nn_logits_padded(h1, h2, w1, w2, src2d, dst2d, chunk_type,
                     compute_dtype=jnp.float32):
    """NN-decoder logits [n_chunks, chunk] from the per-node L1 tables.

    h1/h2: [n_nodes, l1] (relu'd L1 projections); w1/w2: [n_et, l1]
    per-relation L2 rows.  Padding rows (dst = n_nodes) produce garbage in
    the src term — the caller masks with the valid mask, the same contract
    as the XLA path (nn_decoder_apply_padded clamps instead).
    """
    return _nn_fwd(
        h1.T.astype(compute_dtype), h2.T.astype(compute_dtype), w1, w2,
        src2d, dst2d, chunk_type,
    )


def _nn_vjp_fwd(h1, h2, w1, w2, src2d, dst2d, chunk_type, compute_dtype):
    h1t = h1.T.astype(compute_dtype)
    h2t = h2.T.astype(compute_dtype)
    out = _nn_fwd(h1t, h2t, w1, w2, src2d, dst2d, chunk_type)
    return out, (h1t, h2t, w1, w2, src2d, dst2d, chunk_type)


def _nn_vjp_bwd(compute_dtype, res, g2d):
    h1t, h2t, w1, w2, src2d, dst2d, chunk_type = res
    dh1t, dh2t, dw1, dw2 = _nn_bwd(
        h1t, h2t, w1, w2, src2d, dst2d, chunk_type, g2d.astype(jnp.float32)
    )
    return dh1t.T, dh2t.T, dw1, dw2, None, None, None


nn_logits_padded.defvjp(_nn_vjp_fwd, _nn_vjp_bwd)
