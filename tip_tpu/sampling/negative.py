"""Device-side typed negative sampling.

The reference corrupts each positive (drug, drug, relation) triple by drawing
a uniform random pair for the same relation and reject-resampling collisions
with that relation's positive set — on the HOST, with a numpy round trip
every training step (reference: src/neg_sampling.py:5-26, the CPU boundary at
line 8).  This version runs entirely on device under jit:

  * one uniform draw per positive edge over [0, n_nodes)^2 for the edge's
    relation (self-pairs allowed, matching the reference);
  * collision test against the SAME relation's positives, either via a
    **packed bitmap** over the (relation, dst, src) key space — one random
    word-gather per candidate, O(1), the fast path (57 MB for Decagon's
    1,097 x 645 x 645 key space) — or via ``searchsorted`` on the sorted key
    array for key spaces too large to enumerate;
  * a FIXED number of masked resampling rounds instead of the reference's
    unbounded host loop; leftovers after the last round are accepted
    (probability per edge is density^rounds — for Decagon's densest
    relation < 4e-6 at rounds=4).

Returns (neg_src, neg_dst) aligned with the input edge buffer, so the
type-binned range structure of the positives carries over to the negatives
(the reference concatenates per-relation blocks the same way,
reference: src/neg_sampling.py:22-26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_key_bitmap(keys: np.ndarray, key_space: int) -> np.ndarray:
    """Pack positive-edge keys into a uint32 bitmap of ceil(space/32) words
    (native tipcore fast path with numpy fallback)."""
    from tip_tpu.native import build_bitmap

    return build_bitmap(np.asarray(keys, np.int64), key_space)


def _collides_bitmap(cand, bitmap):
    word = bitmap[cand >> 5]
    return (word >> (cand & 31).astype(jnp.uint32)) & 1 != 0


def _collides_sorted(cand, keys_sorted):
    pos = jnp.searchsorted(keys_sorted, cand, method="sort")
    pos = jnp.clip(pos, 0, keys_sorted.shape[0] - 1)
    return keys_sorted[pos] == cand


def typed_negative_sampling(
    key,
    edge_type,
    positives,
    n_nodes: int,
    rounds: int = 4,
):
    """Sample one negative pair per positive edge, per relation.

    edge_type: [E] int32 relation id per positive edge.
    positives: either a uint32 bitmap from :func:`build_key_bitmap` (fast
        path) or a sorted int key array (t*n + dst)*n + src
        (data/packing.py:encode_keys).
    """
    e = edge_type.shape[0]
    base = edge_type.astype(jnp.int32) * (n_nodes * n_nodes)
    is_bitmap = positives.dtype == jnp.uint32

    def draw(k):
        pair = jax.random.randint(k, (e,), 0, n_nodes * n_nodes, dtype=jnp.int32)
        cand = base + pair
        if is_bitmap:
            return pair, _collides_bitmap(cand, positives)
        return pair, _collides_sorted(cand, positives)

    keys = jax.random.split(key, rounds)
    pair, collides = draw(keys[0])
    for r in range(1, rounds):
        new_pair, new_collides = draw(keys[r])
        pair = jnp.where(collides, new_pair, pair)
        collides = jnp.logical_and(collides, new_collides)

    # Keys encode (type, dst, src), so pair = dst * n + src.
    return pair % n_nodes, pair // n_nodes
