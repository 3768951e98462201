import numpy as np
import pytest

from tip_tpu.analysis import per_relation_table, top_bottom, save_report
from tip_tpu.data.decagon import has_reference_data


def _fake_per_rel(n=6):
    rng = np.random.default_rng(0)
    return {
        "auprc": rng.random(n),
        "auroc": rng.random(n),
        "ap": rng.random(n),
        "valid": np.array([True] * (n - 1) + [False]),
    }


def test_table_and_ranking(tmp_path):
    per = _fake_per_rel()
    rows = per_relation_table(per, et_ids=list(range(6)))
    assert len(rows) == 5  # invalid relation dropped
    best, worst = top_bottom(rows, k=2)
    assert best[0]["auprc"] >= best[1]["auprc"] >= worst[1]["auprc"]
    p = tmp_path / "report.json"
    save_report(str(p), rows, {"auprc": 0.9})
    assert p.exists()
    save_report(str(tmp_path / "report.csv"), rows)


@pytest.mark.skipif(not has_reference_data(), reason="needs reference data")
def test_names_and_decagon_ranks():
    from tip_tpu.analysis import decagon_rank_comparison, load_side_effect_names
    from tip_tpu.data.decagon import default_et_list

    et_ids = default_et_list()
    names = load_side_effect_names(et_ids)
    assert len(names) == len(et_ids)
    assert sum(n.startswith("type_") for n in names) < 10  # nearly all resolved
    per = {
        "auprc": np.linspace(0, 1, len(et_ids)),
        "valid": np.ones(len(et_ids), bool),
    }
    cmp = decagon_rank_comparison(per, et_ids)
    assert cmp["n_relations"] == len(et_ids)
    assert len(cmp["decagon_best_ranks"]) > 0
