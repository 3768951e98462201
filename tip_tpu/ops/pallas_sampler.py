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

  1. candidate bits come from the ON-CHIP hardware PRNG
     (``pltpu.prng_seed`` / ``prng_random_bits``), seeded per chunk from a
     scalar-prefetched step seed + the grid index.  Generating the bits
     in-kernel replaces a [n_chunks, rounds*chunk] threefry draw that
     measured ~200 ms/step and ~200 MB of HBM round-trip on the full
     Decagon graph — the sampler's former dominant cost;
  2. bit address: byte = pair >> 3 -> (row = byte >> 7, lane = byte & 127),
     bit-in-byte = pair & 7;
  3. the bitmap is pre-split into little-endian BYTE planes stacked along
     rows, stored as int8 [4*word_rows, 128] (exact — entries are bytes),
     so the MXU does the whole byte gather as a one-hot matmul
     onehot(row) [C, rows] @ table [rows, 128], and the remaining
     per-candidate selection is only 128 lanes wide;
  4. the lane selection is ONE VPU masked row-reduction
     (dynamic_gather serializes; a multiply+reduce runs at vector ALU rate);
  5. colliding candidates are SIGN-FLAGGED in the output and resolved by an
     XLA lane-borrow pass in the wrapper: a flagged lane takes the candidate
     of a clean lane of the same chunk (= same relation) at offsets
     1/2/4/8 — sampling with replacement, marginally uniform over the
     relation's non-positives.  Each extra full-width in-kernel redraw
     round measured ~19 ms/step at Decagon scale and in-kernel pltpu.roll
     ~75 ms; the four XLA passes are <1 ms.  Residual collisions
     (a whole 5-lane neighborhood colliding, ~density^5 — measured 0 of
     8.6M on Decagon) are accepted, mirroring the bounded-tail contract
     (the reference's host loop is unbounded,
     reference: src/neg_sampling.py:12-16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.sampling.negative import bitmap_stride_bits


def _sampler_kernel(n_nodes, rounds, extra_rounds, onchip, chunk_type_ref,
                    rng_ref, tbl_ref, out_ref):
    # ``rng_ref`` is the step seed (scalar, SMEM) when ``onchip`` — the
    # hardware PRNG is seeded per chunk from it — or a pre-drawn
    # [1, 1, total_rounds*chunk] bits block (VMEM) on backends without the
    # in-kernel PRNG (CPU interpret mode stubs prng_random_bits to zeros).
    if onchip:
        pltpu.prng_seed(rng_ref[0], pl.program_id(0))
    c = out_ref.shape[2]
    rows = tbl_ref.shape[1]
    tbl = tbl_ref[0]  # [rows, 128] int8 holding the bitmap's BYTE planes

    # A single 24-bit fixed-point draw cannot reach every pair once
    # n^2 > 2^24 (granularity n^2/2^24 > 1): above 4096 nodes, draw src and
    # dst with INDEPENDENT 24-bit draws (uniform over [0,n)^2 = uniform over
    # pairs), exact for n up to 2^24 — int32 pair addressing caps n at
    # 46340 first (guarded in the wrapper).
    two_draws = n_nodes * n_nodes > (1 << 24)

    def uniform24(r):
        if onchip:
            raw = pltpu.prng_random_bits((1, c))  # int32
            return jax.lax.shift_right_logical(raw, 8).astype(jnp.float32)[0]
        return rng_ref[0, 0, r * c:(r + 1) * c].astype(jnp.float32)

    def draw(r):
        # 24-bit randoms scaled WITHOUT vector integer division (the VPU has
        # none; urem expands to a long emulation) — fixed-point scale, exact
        # in f32, bias ~2^-24.  On chip, ``r`` only distinguishes call
        # sites; each call advances the seeded per-core PRNG stream.
        if two_draws:
            scale = jnp.float32(n_nodes / (1 << 24))
            src = jnp.minimum(
                (uniform24(2 * r) * scale).astype(jnp.int32), n_nodes - 1
            )
            dst = jnp.minimum(
                (uniform24(2 * r + 1) * scale).astype(jnp.int32), n_nodes - 1
            )
            pair = dst * n_nodes + src
        else:
            u = uniform24(r)
            pair = (u * jnp.float32((n_nodes * n_nodes) / (1 << 24))).astype(
                jnp.int32
            )
            pair = jnp.minimum(pair, n_nodes * n_nodes - 1)
        byte_addr = pair >> 3
        row = byte_addr >> 7
        lane = byte_addr & 127
        bit = pair & 7
        # byte gather as an INT8 one-hot matmul with int32 accumulation —
        # exact (entries are bytes) and the MXU's s8 path runs ~2x the
        # single-pass-bf16 rate this kernel used before; byte planes are
        # stacked along ROWS so the MXU does the whole gather and the VPU
        # lane-select below stays 128 wide
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (c, rows), 1)
        oh = (row_ids == row[:, None]).astype(jnp.int8)
        g = jnp.dot(oh, tbl, preferred_element_type=jnp.int32)  # [c, 128]
        # lane select as ONE MXU matvec: a VPU masked lane-reduction
        # (sum(g * at_lane, axis=1)) measured ~30 ms/step of the sampler's
        # 39 — cross-lane shuffles are slow in Mosaic.  Masking leaves one
        # nonzero byte per row (values <= 255, exact in bf16), and a
        # [c, 128] @ [128, 8] ones-matmul reduces the lanes in a single
        # systolic pass (~1.2k cycles/chunk vs ~3k for the shuffle tree).
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 1)
        at_lane = (lane_ids == lane[:, None]).astype(jnp.bfloat16)
        sel = g.astype(jnp.bfloat16) * at_lane
        byte = jnp.dot(
            sel, jnp.ones((128, 8), jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )[:, 0].astype(jnp.int32)
        collides = ((byte >> bit) & 1) != 0
        return pair, collides

    pair, collides = draw(0)
    for r in range(1, rounds):
        new_pair, new_collides = draw(r)
        pair = jnp.where(collides, new_pair, pair)
        collides = jnp.logical_and(collides, new_collides)
    # sign-flag survivors, then resolve them in extra rounds that whole
    # clean chunks skip (out_ref doubles as the carry across @pl.when)
    out_ref[0, 0, :] = jnp.where(collides, -pair - 1, pair)

    if extra_rounds:
        @pl.when(jnp.any(collides))
        def _():
            p = out_ref[0, 0, :]
            col = p < 0
            pr = jnp.where(col, -p - 1, p)
            for r in range(rounds, rounds + extra_rounds):
                new_pair, new_collides = draw(r)
                pr = jnp.where(col, new_pair, pr)
                col = jnp.logical_and(col, new_collides)
            out_ref[0, 0, :] = pr  # survivors of the last round: accepted


def typed_negative_sampling_padded(
    key,
    chunk_type,
    bitmap,
    n_nodes: int,
    n_et: int,
    chunk: int,
    rounds: int = 1,
    tail_rounds: int = 0,
    onchip_prng: bool | None = None,
    planes=None,
):
    """Sample negatives for a chunk-aligned typed edge buffer, on-chip.

    key: jax.random key (seeds the hardware PRNG / the fallback jax stream).
    chunk_type: [n_chunks] relation per chunk (non-decreasing).
    bitmap: uint32 flat relation-strided bitmap (build_typed_bitmap).
    rounds: unconditional full-width rounds; tail_rounds more run per chunk
    only while the chunk still has collisions.
    onchip_prng: draw candidate bits with the in-kernel hardware PRNG
    (default on real TPU; CPU interpret mode stubs it to zeros, so the
    fallback pre-draws bits with jax.random and streams them in).
    Returns pair [n_chunks, chunk] int32 with pair = dst * n_nodes + src.
    """
    if n_nodes > 46340:  # floor(sqrt(2^31 - 1))
        raise ValueError(
            f"n_nodes={n_nodes}: int32 pair encoding (dst * n + src) "
            "overflows; the Pallas sampler needs 64-bit keys for graphs "
            "this large — use the XLA sampler path"
        )
    n_chunks = chunk_type.shape[0]
    stride_words = bitmap_stride_bits(n_nodes) // 32
    rows = stride_words * 4 // 128  # one byte per entry
    if planes is not None:
        # Precomputed at graph-pack time (sampling/negative.py:
        # bitmap_byte_planes): the table is static per split, and rebuilding
        # it in-step costs a full shift/mask pass over the 57 MB bitmap.
        tblb = planes
    else:
        words = bitmap.reshape(n_et, stride_words)
        # little-endian byte planes stacked along rows, stored as INT8: the
        # s8 MXU path accumulates exactly into int32 at ~2x the
        # single-pass-bf16 rate (bytes land in [-128, 127] after the int8
        # cast; the sign bit round-trips exactly through int32 `& 0xFF`-free
        # arithmetic because only bit tests are performed downstream).  byte
        # address b = pair >> 3 maps to (row = b >> 7, lane = b & 127).
        tblb = (
            jnp.stack(
                [((words >> (8 * p)) & jnp.uint32(0xFF)) for p in range(4)],
                axis=2,
            )
            .reshape(n_et, rows, 128)
            .astype(jnp.uint8)
            .astype(jnp.int8)
        )
    total_rounds = rounds + tail_rounds
    # two 24-bit draws per candidate above 4096 nodes (see _sampler_kernel)
    draws_per_round = 2 if n_nodes * n_nodes > (1 << 24) else 1
    if onchip_prng is None:
        onchip_prng = jax.default_backend() == "tpu"
    if onchip_prng:
        # One scalar step seed; the kernel folds in the grid index per chunk
        # and draws all candidate bits from the on-chip hardware PRNG.
        rng_arg = jax.lax.bitcast_convert_type(
            jax.random.bits(key, (1,), jnp.uint32), jnp.int32
        )
        rng_prefetch = 1
        rng_in_specs = []
    else:
        # Fallback for backends without the in-kernel PRNG (CPU interpret
        # mode): pre-draw 24-bit candidates with the jax stream.
        n_words = draws_per_round * total_rounds * chunk
        rng_arg = (
            jax.random.bits(key, (n_chunks, 1, n_words), jnp.uint32) >> 8
        ).astype(jnp.int32)
        rng_prefetch = 0
        rng_in_specs = [
            pl.BlockSpec(
                (1, 1, n_words), lambda i, ct: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]

    nsp = 1 + rng_prefetch
    tbl_index = lambda i, *sp: (sp[0][i], 0, 0)
    out_index = lambda i, *sp: (i, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,  # chunk_type (+ seed when onchip)
        grid=(n_chunks,),
        in_specs=rng_in_specs + [
            pl.BlockSpec((1, rows, 128), tbl_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, chunk), out_index, memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _sampler_kernel, n_nodes, rounds, tail_rounds, onchip_prng
    )
    # Operand order is (chunk_type, rng, tbl) in both modes: the seed rides
    # as a second scalar-prefetch, the bits block as a leading VMEM input.
    out3d = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 1, chunk), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * rounds * chunk * rows * 128,
            bytes_accessed=n_et * rows * 128 * 4 + n_chunks * chunk * 4,
            transcendentals=0,
        ),
    )(chunk_type, rng_arg, tblb)
    out = out3d.reshape(n_chunks, chunk)
    # Lane-rotation fallback, in XLA-land: a lane the kernel sign-flagged as
    # colliding borrows the candidate of a CLEAN lane of the SAME chunk
    # (same relation) at increasing offsets — sampling with replacement, so
    # each lane's marginal stays uniform over the relation's non-positives.
    # This replaces full-width redraw rounds: one kernel draw costs ~19
    # ms/step at Decagon scale, these four vectorized passes over the
    # [n_chunks, chunk] buffer <1 ms (in-kernel pltpu.roll measured ~75 ms —
    # lane permutes are slow inside Mosaic).  Residual collisions (all lanes
    # in a 5-lane neighborhood colliding, ~density^5) keep the sign flag and
    # fall through to the kernel's accept-leftovers contract.
    for shift in (1, 2, 4, 8):
        alt = jnp.roll(out, shift, axis=1)
        out = jnp.where((out < 0) & (alt >= 0), alt, out)
    return jnp.where(out < 0, -out - 1, out)
