"""preferred_dense_dtype / max_multiplicity policy tests."""

import numpy as np

from tip_tpu.data import build_trigraph, synthetic_trigraph
from tip_tpu.data.packing import (
    TypedEdges,
    max_multiplicity,
    sort_typed_edges,
)
from tip_tpu.train.model import preferred_dense_dtype


def _typed(src, dst, et, n_et):
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    et = np.asarray(et, np.int32)
    counts = np.bincount(et, minlength=n_et)
    ends = np.cumsum(counts)
    rl = np.stack([ends - counts, ends], axis=1).astype(np.int32)
    return sort_typed_edges(
        TypedEdges(edge_index=np.stack([src, dst]), edge_type=et, range_list=rl)
    )


def test_max_multiplicity_counts_duplicates():
    e = _typed([0, 0, 0, 1], [1, 1, 1, 2], [0, 0, 0, 0], 1)
    assert max_multiplicity(e, 4) == 3
    e2 = _typed([0, 1, 2], [1, 2, 3], [0, 0, 1], 2)
    assert max_multiplicity(e2, 4) == 1


def test_preferred_dense_dtype_prefers_bf16():
    raw = synthetic_trigraph(n_drug=30, n_prot=20, n_et=3, pairs_per_et=30, seed=1)
    data = build_trigraph(raw, split_rate=0.9, seed=0)
    assert preferred_dense_dtype(data, "float32") == "bfloat16"
    assert preferred_dense_dtype(data, "bfloat16") == "bfloat16"


def test_preferred_dense_dtype_falls_back_on_big_counts():
    raw = synthetic_trigraph(n_drug=30, n_prot=20, n_et=2, pairs_per_et=10, seed=2)
    data = build_trigraph(raw, split_rate=0.9, seed=0)
    # forge a train buffer whose first edge repeats 300x: bf16 can't hold
    # the count exactly -> policy must fall back to the kernel dtype
    t = data.dd_train
    src = np.concatenate([np.repeat(t.edge_index[0][:1], 300), t.edge_index[0]])
    dst = np.concatenate([np.repeat(t.edge_index[1][:1], 300), t.edge_index[1]])
    et = np.concatenate([np.repeat(t.edge_type[:1], 300), t.edge_type])
    forged = _typed(src, dst, et, t.n_et)
    import dataclasses

    data2 = dataclasses.replace(data, dd_train=forged)
    assert max_multiplicity(forged, data.n_drug) >= 300
    assert preferred_dense_dtype(data2, "float32") == "float32"
