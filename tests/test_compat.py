"""data_dict.pkl compatibility loader against a synthetic reference pickle."""

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tip_tpu.data.compat import load_data_dict
from tip_tpu.data import synthetic_trigraph, build_trigraph


def _make_reference_pickle(path):
    """Build a data_dict.pkl with the reference's exact key layout
    (reference: prepare.py:46-47) from a synthetic tri-graph."""
    raw = synthetic_trigraph(n_drug=30, n_prot=50, n_et=4, pairs_per_et=40, seed=21)
    g = build_trigraph(raw, split_rate=0.85, seed=21)
    t = lambda a, dt=torch.long: torch.tensor(np.asarray(a), dtype=dt)
    d = {
        "n_drug": g.n_drug,
        "n_prot": g.n_prot,
        "n_dd_et": g.n_et,
        "dd_train_idx": t(g.dd_train.edge_index),
        "dd_train_et": t(g.dd_train.edge_type),
        "dd_train_range": t(g.dd_train.range_list),
        "dd_test_idx": t(g.dd_test.edge_index),
        "dd_test_et": t(g.dd_test.edge_type),
        "dd_test_range": t(g.dd_test.range_list),
        "pp_train_indices": t(g.pp_train),
        "pp_test_indices": t(g.pp_test),
        # reference layout: drug row carries the +n_prot offset
        "dp_edge_index": t(
            np.stack([g.dp_edge_index[0], g.dp_edge_index[1] + g.n_prot])
        ),
        "d_norm": torch.ones(g.n_drug),
    }
    with open(path, "wb") as f:
        pickle.dump(d, f)
    return g


def test_load_data_dict_roundtrip(tmp_path):
    path = str(tmp_path / "data_dict.pkl")
    want = _make_reference_pickle(path)
    got = load_data_dict(path)

    assert (got.n_drug, got.n_prot, got.n_et) == (want.n_drug, want.n_prot, want.n_et)
    np.testing.assert_array_equal(got.dd_train.edge_index, want.dd_train.edge_index)
    np.testing.assert_array_equal(got.dd_train.range_list, want.dd_train.range_list)
    np.testing.assert_array_equal(got.dd_train_deg, want.dd_train_deg)
    np.testing.assert_array_equal(got.dd_train_keys, want.dd_train_keys)
    np.testing.assert_array_equal(got.dp_edge_index, want.dp_edge_index)
    np.testing.assert_allclose(got.pp_norm_weight, want.pp_norm_weight, atol=1e-6)
    assert got.d_norm is None  # all-ones d_norm collapses to the no-op path


def test_loaded_graph_trains(tmp_path):
    import jax
    from tip_tpu.config import ModelConfig
    from tip_tpu.train.model import TIP, make_graph_arrays

    path = str(tmp_path / "data_dict.pkl")
    _make_reference_pickle(path)
    data = load_data_dict(path)
    graph, gs = make_graph_arrays(data, dd_chunk=16, pp_window=64, pp_chunk=16)
    cfg = ModelConfig(mode="cat", prot_drug_dim=6, n_embed=8, n_hid1=8,
                      n_hid2=6, num_base=4, pp_hid1=8, pp_hid2=6)
    model = TIP.for_data(cfg, data, gs)
    params = model.init(jax.random.key(0))
    loss = float(model.loss(params, graph, jax.random.key(1)))
    assert np.isfinite(loss)
