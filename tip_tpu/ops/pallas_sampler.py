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
  3. the bitmap is pre-split into little-endian BYTE planes, stored as int8
     TRANSPOSED [128, rows] (exact — entries are bytes), so the MXU does
     the whole byte gather as table_t [128, rows] @ onehot_t [rows, C] with
     the candidate axis on the lanes end to end — Mosaic layout changes
     between matmul and elementwise orientation were ~70% of an earlier
     kernel's runtime (34.9 -> 8.7 ms/step, runs/probe_sampler*.out);
  4. the lane selection masks to one nonzero byte per candidate column and
     reduces the sublanes with ONE [8, 128] ones-matmul (dynamic_gather
     serializes; VPU cross-lane shuffle trees measured ~3x this kernel);
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
    #
    # EVERYTHING here is (1, c) or (*, c): the candidate axis stays on the
    # 128-wide VPU lanes end to end, and the table is pre-transposed
    # (tbl_t [128, rows]) so both matmuls contract against it without a
    # single relayout.  The previous orientation (candidates on sublanes
    # for the matmuls, 1-D [c] vectors for the scalar chain) spent ~70% of
    # the kernel in Mosaic layout changes: 34.9 -> 8.7 ms/step at Decagon
    # scale for the identical math (runs/probe_sampler*.out).
    if onchip:
        pltpu.prng_seed(rng_ref[0], pl.program_id(0))
    c = out_ref.shape[2]
    rows = tbl_ref.shape[2]
    tbl_t = tbl_ref[0]  # [128, rows] int8: transposed bitmap BYTE planes

    # A single 24-bit fixed-point draw cannot reach every pair once
    # n^2 > 2^24 (granularity n^2/2^24 > 1): above 4096 nodes, draw src and
    # dst with INDEPENDENT 24-bit draws (uniform over [0,n)^2 = uniform over
    # pairs), exact for n up to 2^24 — int32 pair addressing caps n at
    # 46340 first (guarded in the wrapper).
    two_draws = n_nodes * n_nodes > (1 << 24)

    def uniform24(r):
        if onchip:
            raw = pltpu.prng_random_bits((1, c))  # int32
            return jax.lax.shift_right_logical(raw, 8).astype(jnp.float32)
        return rng_ref[0, 0:1, r * c:(r + 1) * c].astype(jnp.float32)

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
        byte_addr = pair >> 3  # all (1, c)
        row = byte_addr >> 7
        lane = byte_addr & 127
        bit = pair & 7
        # byte gather as an INT8 one-hot matmul with int32 accumulation —
        # exact (entries are bytes).  The one-hot is built TRANSPOSED
        # ([rows, c], (1, c) row ids broadcast over sublanes for free) and
        # the table contracts from the left: g_t[l, e] = tbl[row_e, l].
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 0)
        oh_t = (row_ids == row).astype(jnp.int8)
        g_t = jnp.dot(tbl_t, oh_t, preferred_element_type=jnp.int32)  # [128, c]
        # lane select: mask to one nonzero byte per candidate column
        # (values <= 255, exact in bf16), then ONE [8, 128] ones-matmul
        # reduces the sublanes — a VPU cross-lane shuffle tree measured
        # ~3x the whole kernel's budget.
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (128, c), 0)
        at_lane_t = (lane_ids == lane).astype(jnp.bfloat16)
        sel_t = g_t.astype(jnp.bfloat16) * at_lane_t  # [128, c]
        byte = jnp.dot(
            jnp.ones((8, 128), jnp.bfloat16), sel_t,
            preferred_element_type=jnp.float32,
        )[0:1, :].astype(jnp.int32)  # (1, c)
        collides = ((byte >> bit) & 1) != 0
        return pair, collides

    pair, collides = draw(0)
    for r in range(1, rounds):
        new_pair, new_collides = draw(r)
        pair = jnp.where(collides, new_pair, pair)
        collides = jnp.logical_and(collides, new_collides)
    # sign-flag survivors, then resolve them in extra rounds that whole
    # clean chunks skip (out_ref doubles as the carry across @pl.when)
    out_ref[0] = jnp.where(collides, -pair - 1, pair)

    if extra_rounds:
        @pl.when(jnp.any(collides))
        def _():
            p = out_ref[0, 0:1, :]
            col = p < 0
            pr = jnp.where(col, -p - 1, p)
            for r in range(rounds, rounds + extra_rounds):
                new_pair, new_collides = draw(r)
                pr = jnp.where(col, new_pair, pr)
                col = jnp.logical_and(col, new_collides)
            out_ref[0] = pr  # survivors of the last round: accepted


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
    _resolve: bool = True,
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
        # bitmap_byte_planes, TRANSPOSED [n_et, 128, rows]): the table is
        # static per split, and rebuilding it in-step costs a full
        # shift/mask pass over the 57 MB bitmap.
        tblb = planes
    else:
        words = bitmap.reshape(n_et, stride_words)
        # little-endian byte planes, stored as INT8 and TRANSPOSED to
        # [n_et, 128(lane), rows] — the kernel keeps candidates on the
        # lanes, so the table keeps its lane axis on the sublanes (bytes
        # land in [-128, 127] after the int8 cast; the sign bit round-trips
        # exactly because only bit tests are performed downstream).  byte
        # address b = pair >> 3 maps to (row = b >> 7, lane = b & 127).
        tblb = jnp.swapaxes(
            jnp.stack(
                [((words >> (8 * p)) & jnp.uint32(0xFF)) for p in range(4)],
                axis=2,
            )
            .reshape(n_et, rows, 128)
            .astype(jnp.uint8)
            .astype(jnp.int8),
            1, 2,
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
            pl.BlockSpec((1, 128, rows), tbl_index, memory_space=pltpu.VMEM),
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
    if not _resolve:
        return out  # raw sign-flagged kernel output (statistical tests)
    return resolve_borrow(out)


def resolve_borrow(out):
    """Lane-rotation collision resolution, in XLA-land.

    A lane the kernel sign-flagged as colliding borrows the candidate of a
    CLEAN lane of the SAME chunk (same relation) at increasing offsets —
    sampling with replacement, so each lane's marginal stays uniform over
    the relation's non-positives (clean draws are i.i.d. uniform there, and
    a borrowed value is a copy of some clean draw; chi-square validated in
    tests/test_sampler_stats.py).  This replaces full-width redraw rounds:
    one kernel draw costs ~19 ms/step at Decagon scale, these four
    vectorized passes over the [n_chunks, chunk] buffer <1 ms (in-kernel
    pltpu.roll measured ~75 ms — lane permutes are slow inside Mosaic).
    Residual collisions (a whole flagged lane neighborhood, ~density^5)
    keep the sign flag and fall through to the kernel's accept-leftovers
    contract (the reference's host loop is unbounded,
    reference: src/neg_sampling.py:12-16).
    """
    for shift in (1, 2, 4, 8):
        alt = jnp.roll(out, shift, axis=1)
        out = jnp.where((out < 0) & (alt >= 0), alt, out)
    return jnp.where(out < 0, -out - 1, out)
