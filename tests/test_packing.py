import numpy as np
import pytest

from tip_tpu.data import synthetic_trigraph, build_trigraph
from tip_tpu.data.packing import (
    split_typed_edges,
    sort_typed_edges,
    in_degree,
    encode_keys,
    pad_typed_edges,
    gcn_normalize,
)


@pytest.fixture(scope="module")
def raw():
    return synthetic_trigraph(n_drug=40, n_prot=60, n_et=5, pairs_per_et=30, seed=1)


def test_split_is_partition_and_bidirected(raw):
    train, test = split_typed_edges(raw.dd_pair_list, p=0.8, seed=2)
    for t, pairs in enumerate(raw.dd_pair_list):
        s, e = train.range_list[t]
        s2, e2 = test.range_list[t]
        n_tr, n_te = (e - s) // 2, (e2 - s2) // 2
        assert n_tr + n_te == pairs.shape[1]
        # bidirected: each half mirrors the other
        tr = train.edge_index[:, s:e]
        assert np.array_equal(tr[:, :n_tr], tr[::-1, n_tr:])
        # no pair appears in both splits
        def pairset(idx):
            lo = np.minimum(idx[0], idx[1])
            hi = np.maximum(idx[0], idx[1])
            return set(zip(lo.tolist(), hi.tolist()))
        assert not (pairset(tr) & pairset(test.edge_index[:, s2:e2]))


def test_sort_gives_globally_sorted_segments(raw):
    train, _ = split_typed_edges(raw.dd_pair_list, p=0.8, seed=2)
    train = sort_typed_edges(train)
    seg = train.edge_type.astype(np.int64) * raw.n_drug + train.edge_index[1]
    assert np.all(np.diff(seg) >= 0)
    # range_list still delimits each relation
    for t in range(train.n_et):
        s, e = train.range_list[t]
        assert np.all(train.edge_type[s:e] == t)


def test_encode_keys_sorted_and_unique_per_edge(raw):
    train, _ = split_typed_edges(raw.dd_pair_list, p=0.8, seed=2)
    train = sort_typed_edges(train)
    keys = encode_keys(train, raw.n_drug)
    assert np.all(np.diff(keys) > 0)  # strictly increasing: no duplicate edges


def test_in_degree(raw):
    train, _ = split_typed_edges(raw.dd_pair_list, p=0.8, seed=2)
    deg = in_degree(train.edge_index, raw.n_drug)
    assert deg.sum() == train.n_edges
    ref = np.zeros(raw.n_drug, np.int64)
    for d in train.edge_index[1]:
        ref[d] += 1
    assert np.array_equal(deg, ref)


def test_padding_invariants(raw):
    train, _ = split_typed_edges(raw.dd_pair_list, p=0.8, seed=2)
    train = sort_typed_edges(train)
    padded = pad_typed_edges(train, raw.n_drug, chunk=16)
    assert padded.src.shape[0] % 16 == 0
    assert padded.n_valid == train.n_edges
    assert padded.valid.sum() == train.n_edges
    # padded slots point one past the last node -> masked by one-hot
    assert np.all(padded.dst[~padded.valid] == raw.n_drug)
    # every chunk belongs to exactly one relation
    ct = padded.chunk_type
    for i, t in enumerate(ct):
        s, e = i * 16, (i + 1) * 16
        lo, hi = padded.range_list[t]
        assert lo <= s and e <= hi
    # valid edges survive in order within each relation
    for t in range(train.n_et):
        s_old, e_old = train.range_list[t]
        s_new = padded.range_list[t, 0]
        n = e_old - s_old
        assert np.array_equal(padded.src[s_new:s_new + n], train.edge_index[0, s_old:e_old])
        assert np.array_equal(padded.dst[s_new:s_new + n], train.edge_index[1, s_old:e_old])


def test_gcn_normalize_row_sums():
    rng = np.random.default_rng(0)
    n = 30
    e = rng.integers(0, n, size=(2, 100), dtype=np.int32)
    e = e[:, e[0] != e[1]]
    e = np.unique(np.stack([np.minimum(e[0], e[1]), np.maximum(e[0], e[1])]), axis=1)
    e = np.concatenate([e, e[::-1]], axis=1)  # symmetric, deduped
    idx, w = gcn_normalize(e, n)
    assert np.all(np.diff(idx[1]) >= 0)  # dst-sorted
    # A_hat row sums of an all-ones vector equal D^-1/2 (A+I) D^-1/2 @ 1
    a = np.zeros((n, n))
    a[e[1], e[0]] = 1.0
    a += np.eye(n)
    deg = a.sum(1)
    dinv = 1.0 / np.sqrt(deg)
    expect = (dinv[:, None] * a * dinv[None, :]).sum(1)
    got = np.zeros(n)
    np.add.at(got, idx[1], w)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_build_trigraph_end_to_end(raw):
    g = build_trigraph(raw, split_rate=0.85, seed=5)
    assert g.n_et == len(raw.dd_pair_list)
    assert g.dd_train_deg.sum() == g.dd_train.n_edges
    assert np.all(np.diff(g.dd_train_keys) > 0)
    assert np.all(np.diff(g.pp_norm_index[1]) >= 0)
    assert np.all(np.diff(g.dp_edge_index[1]) >= 0)
    # pp split partitions unique pairs
    n_pairs = raw.pp_edge_index.shape[1] // 2
    assert g.pp_train.shape[1] + g.pp_test.shape[1] == 2 * n_pairs
