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


def test_go_enrichment_machinery(tmp_path):
    """GAF/OBO parsing + Fisher-exact enrichment (check_data cells 18-32
    analog) on synthetic fixtures: a term concentrated in the study set
    must rank first with a small p; a uniform term must not."""
    from tip_tpu.analysis.explain import go_enrichment, parse_gaf, parse_obo

    gaf = tmp_path / "mini.gaf"
    lines = ["!gaf-version: 2.2"]
    # 40 background genes: all carry GO:0000002; genes 0-4 carry GO:0000001
    for i in range(40):
        terms = ["GO:0000002"] + (["GO:0000001"] if i < 5 else [])
        for t in terms:
            lines.append(
                "\t".join(["DB", f"ID{i}", f"G{i}", "", t, "REF", "IEA",
                           "", "P", "", "", "protein", "taxon:9606",
                           "20240101", "DB"])
            )
    # one NOT-qualified row that must be ignored
    lines.append("\t".join(["DB", "IDx", "G39", "NOT", "GO:0000001", "REF",
                            "IEA", "", "P", "", "", "protein",
                            "taxon:9606", "20240101", "DB"]))
    gaf.write_text("\n".join(lines) + "\n")
    obo = tmp_path / "mini.obo"
    obo.write_text(
        "format-version: 1.2\n\n[Term]\nid: GO:0000001\n"
        "name: study process\nnamespace: biological_process\n\n"
        "[Term]\nid: GO:0000002\nname: common process\n"
        "namespace: biological_process\nalt_id: GO:0000099\n\n"
    )
    anno = parse_gaf(str(gaf))
    assert anno["G0"] == {"GO:0000001", "GO:0000002"}
    assert "GO:0000001" not in anno["G39"]  # NOT row skipped
    terms = parse_obo(str(obo))
    assert terms["GO:0000001"]["name"] == "study process"
    assert terms["GO:0000099"]["name"] == "common process"  # alt_id alias

    rows = go_enrichment([f"G{i}" for i in range(5)], anno, terms)
    assert rows[0]["go_id"] == "GO:0000001"
    assert rows[0]["p"] < 1e-4 and rows[0]["n_study"] == 5
    uniform = [r for r in rows if r["go_id"] == "GO:0000002"][0]
    assert uniform["p"] == 1.0
    assert rows[0]["q"] <= uniform["q"]
