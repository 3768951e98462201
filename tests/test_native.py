"""Native tipcore library vs numpy fallbacks."""

import numpy as np
import pytest

from tip_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("tipcore could not be built (no g++?)")
    return lib


def test_native_builds(lib):
    assert lib is not None


def test_sort_edges_matches_lexsort(lib, rng):
    e, n = 50_000, 700
    et = rng.integers(0, 40, e).astype(np.int32)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    got = native.sort_edges_order(et, dst, src, n)
    key = (et.astype(np.int64) * n + dst) * n + src
    assert np.array_equal(key[got], np.sort(key))


def test_bitmap_matches_numpy(lib, rng):
    space = 100_000
    keys = np.unique(rng.integers(0, space, 5000)).astype(np.int64)
    got = native.build_bitmap(keys, space)
    want = np.zeros((space + 31) // 32, np.uint32)
    np.bitwise_or.at(want, keys >> 5, np.uint32(1) << (keys & 31).astype(np.uint32))
    assert np.array_equal(got, want)


def test_bincount_matches_numpy(lib, rng):
    x = rng.integers(0, 99, 10_000).astype(np.int32)
    assert np.array_equal(native.bincount_i32(x, 120), np.bincount(x, minlength=120))


def test_pad_typed_fill_matches_python(lib, rng):
    from tip_tpu.data.packing import TypedEdges, pad_typed_edges, _ranges_from_counts

    counts = rng.integers(1, 50, 10)
    ranges = _ranges_from_counts(counts)
    e = int(counts.sum())
    edges = TypedEdges(
        rng.integers(0, 30, (2, e)).astype(np.int32),
        np.repeat(np.arange(10, dtype=np.int32), counts),
        ranges,
    )
    padded = pad_typed_edges(edges, 30, chunk=16)
    # cross-check against a straightforward python fill
    for t in range(10):
        s_old, e_old = ranges[t]
        s_new = padded.range_list[t, 0]
        n = e_old - s_old
        assert np.array_equal(padded.src[s_new:s_new + n], edges.edge_index[0, s_old:e_old])
        assert np.array_equal(padded.dst[s_new:s_new + n], edges.edge_index[1, s_old:e_old])
        assert padded.valid[s_new:s_new + n].all()
    assert padded.valid.sum() == e
    assert np.all(padded.dst[~padded.valid] == 30)
