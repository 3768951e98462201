"""Pallas TPU kernel for typed negative sampling.

The XLA sampler gathers one bitmap word per candidate from HBM — a
latency-bound random access that measured ~253 ms/step on the full Decagon
graph (4 rounds x 8.5M candidates).  This kernel exploits the type-binned
chunk layout instead: each edge chunk belongs to ONE relation, whose
membership-bitmap slice is a [rows, 128]-word tile block
(sampling/negative.py:bitmap_stride_bits) small enough to sit in VMEM.
Consecutive chunks of the same relation reuse the resident block, so the
whole bitmap streams through VMEM once per step and every candidate lookup
is on-chip.

Lookup path (Mosaic's dynamic_gather cannot cross vregs along the gather
dimension, so a direct [rows, 128] row-gather is unsupported):

  1. candidate pairs come from jax.random bits generated OUTSIDE the kernel
     (uniform over n^2 with negligible modulo bias n^2/2^32 < 1e-4);
  2. bit address: word = pair >> 5 -> (row = word >> 7, lane = word & 127),
     bit = pair & 31;
  3. the bitmap is pre-split into 16-bit halves stored as float32
     [rows, 256] (exact: < 2^24), so the ROW gather becomes a one-hot MXU
     matmul  onehot(row) [C, rows] @ table [rows, 256];
  4. the LANE and 16-bit-half selection is ONE VPU masked row-reduction
     (dynamic_gather serializes; a multiply+reduce runs at vector ALU rate);
  5. rejected candidates fall through to the next round's draw (masked
     select); survivors after the last round are accepted (density^rounds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.sampling.negative import bitmap_stride_bits


def _sampler_kernel(n_nodes, rounds, chunk_type_ref, bits_ref, tbl_ref, out_ref):
    c = out_ref.shape[2]
    rows = tbl_ref.shape[1]
    tbl = tbl_ref[0]  # [rows, 256] f32: lanes 0..127 low half, 128..255 high

    def draw(r):
        # 24-bit int32 randoms (prepared outside the kernel): uniform over
        # [0, n^2) WITHOUT vector integer division (the VPU has none; urem
        # expands to a long emulation) — fixed-point scale, exact in f32,
        # bias ~2^-24.
        u = bits_ref[0, 0, r * c:(r + 1) * c].astype(jnp.float32)
        pair = (u * jnp.float32((n_nodes * n_nodes) / (1 << 24))).astype(jnp.int32)
        pair = jnp.minimum(pair, n_nodes * n_nodes - 1)
        word = pair >> 5
        row = word >> 7
        lane = word & 127
        bit = pair & 31
        # row gather as one-hot matmul (f32 halves are exact < 2^16)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (c, rows), 1)
        oh = (row_ids == row[:, None]).astype(jnp.float32)
        g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)  # [c, 256]
        # lane + half select in one masked reduction (masks built in f32:
        # Mosaic cannot insert dims on 1-bit bools)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 1)
        at_lane = (lane_ids == lane[:, None]).astype(jnp.float32)
        want_hi = (bit >= 16).astype(jnp.float32)[:, None]
        m_lo = at_lane * (1.0 - want_hi)
        m_hi = at_lane * want_hi
        half = jnp.sum(
            g[:, :128] * m_lo + g[:, 128:] * m_hi, axis=1
        ).astype(jnp.int32)  # exact (< 2^16)
        bexp = (bit & 15).astype(jnp.int32)
        collides = ((half >> bexp) & 1) != 0
        return pair, collides

    pair, collides = draw(0)
    for r in range(1, rounds):
        new_pair, new_collides = draw(r)
        pair = jnp.where(collides, new_pair, pair)
        collides = jnp.logical_and(collides, new_collides)
    out_ref[0, 0, :] = pair


def typed_negative_sampling_padded(
    key, chunk_type, bitmap, n_nodes: int, n_et: int, chunk: int, rounds: int = 4
):
    """Sample negatives for a chunk-aligned typed edge buffer, on-chip.

    key: jax.random key (candidate bits come from the jax stream).
    chunk_type: [n_chunks] relation per chunk (non-decreasing).
    bitmap: uint32 flat relation-strided bitmap (build_typed_bitmap).
    Returns pair [n_chunks, chunk] int32 with pair = dst * n_nodes + src.
    """
    n_chunks = chunk_type.shape[0]
    stride_words = bitmap_stride_bits(n_nodes) // 32
    rows = stride_words // 128
    words = bitmap.reshape(n_et, rows, 128)
    # 16-bit halves as exact float32, low half in lanes 0..127
    tblf = jnp.concatenate(
        [
            (words & jnp.uint32(0xFFFF)).astype(jnp.float32),
            (words >> 16).astype(jnp.float32),
        ],
        axis=2,
    )  # [n_et, rows, 256]
    bits = (
        jax.random.bits(key, (n_chunks, 1, rounds * chunk), jnp.uint32) >> 8
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # chunk_type
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, rounds * chunk), lambda i, ct: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, 256), lambda i, ct: (ct[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, chunk), lambda i, ct: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out3d = pl.pallas_call(
        functools.partial(_sampler_kernel, n_nodes, rounds),
        out_shape=jax.ShapeDtypeStruct((n_chunks, 1, chunk), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * rounds * chunk * rows * 256,
            bytes_accessed=n_et * stride_words * 8
            + n_chunks * chunk * rounds * 4,
            transcendentals=0,
        ),
    )(chunk_type, bits, tblf)
    return out3d.reshape(n_chunks, chunk)
