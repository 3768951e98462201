"""Pallas sampler kernel in interpreter mode vs invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.data import synthetic_trigraph, build_trigraph
from tip_tpu.data.packing import pad_typed_edges
from tip_tpu.ops.pallas_sampler import typed_negative_sampling_padded
from tip_tpu.sampling.negative import bitmap_stride_bits


@pytest.fixture(scope="module")
def setup():
    # n_drug such that bitmap rows <= chunk: stride(40)=tile -> rows=8
    raw = synthetic_trigraph(n_drug=40, n_prot=10, n_et=5, pairs_per_et=80, seed=6)
    data = build_trigraph(raw, split_rate=0.95, seed=6)
    padded = pad_typed_edges(data.dd_train, data.n_drug, chunk=64)
    n_chunks = padded.chunk_type.shape[0]
    return data, padded, n_chunks


def _run(data, padded, n_chunks, seed):
    seed = jax.random.key(seed)
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(
            typed_negative_sampling_padded(
                seed,
                jnp.asarray(padded.chunk_type),
                jnp.asarray(data.dd_train_bitmap),
                data.n_drug,
                data.n_et,
                padded.chunk,
                rounds=6,
            )
        )


def test_sampler_kernel_invariants(setup):
    data, padded, n_chunks = setup
    n = data.n_drug
    pair = _run(data, padded, n_chunks, 123)
    assert pair.shape == (n_chunks, padded.chunk)
    assert pair.min() >= 0 and pair.max() < n * n
    # no sampled pair collides with a same-type positive (valid slots)
    src, dst = pair % n, pair // n
    et = np.repeat(padded.chunk_type, padded.chunk).reshape(pair.shape)
    valid = padded.valid.reshape(pair.shape)
    stride = bitmap_stride_bits(n)
    bits = et.astype(np.int64) * stride + pair
    words = data.dd_train_bitmap[(bits >> 5)]
    collides = (words >> (bits & 31).astype(np.uint32)) & 1 != 0
    assert not collides[valid].any()
    # covers a large fraction of the node range
    assert len(np.unique(src[valid])) > n * 0.8


def test_sampler_kernel_seed_behavior(setup):
    data, padded, n_chunks = setup
    a = _run(data, padded, n_chunks, 1)
    b = _run(data, padded, n_chunks, 1)
    c = _run(data, padded, n_chunks, 2)
    assert np.array_equal(a, b)  # deterministic per seed
    assert not np.array_equal(a, c)  # different seeds differ


def test_sampler_planes_identical(setup):
    """Precomputed byte planes (sampling/negative.py:bitmap_byte_planes)
    produce bit-identical samples to the in-step table construction."""
    from tip_tpu.sampling.negative import bitmap_byte_planes

    data, padded, n_chunks = setup
    planes = jnp.asarray(
        bitmap_byte_planes(data.dd_train_bitmap, data.n_et, data.n_drug)
    )
    seed = jax.random.key(123)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(
            typed_negative_sampling_padded(
                seed, jnp.asarray(padded.chunk_type),
                jnp.asarray(data.dd_train_bitmap), data.n_drug, data.n_et,
                padded.chunk, rounds=6,
            )
        )
        b = np.asarray(
            typed_negative_sampling_padded(
                seed, jnp.asarray(padded.chunk_type),
                jnp.asarray(data.dd_train_bitmap), data.n_drug, data.n_et,
                padded.chunk, rounds=6, planes=planes,
            )
        )
    np.testing.assert_array_equal(a, b)
