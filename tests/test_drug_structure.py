"""Tests for tip_tpu.data.drug_structure (Morgan/ECFP + Dice matrix).

Reference behavior: data/drug_structure/data_deepddi.py:25-46 (RDKit counted
Morgan radius-2 fingerprints, pairwise DiceSimilarity, CSV matrix output).
"""

import os

import numpy as np
import pytest

from tip_tpu.data.drug_structure import (
    Mol,
    calculate_drug_similarity,
    dice_similarity_matrix,
    fold_fingerprints,
    morgan_fingerprint,
    parse_molfile,
)

REF_SDF_DIR = "/root/reference/data/drug_structure/DrugBank5.0_Approved_drugs"

# Ethanol: C-C-O with explicit coordinates (V2000).
ETHANOL = """
  test  2D

  3  2  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    2.0000    0.0000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  2  3  1  0
M  END
"""

# Benzene: aromatic 6-ring.
BENZENE_LINES = ["", "  test  2D", "", "  6  6  0  0  0  0  0  0  0999 V2000"]
for i in range(6):
    BENZENE_LINES.append(
        f"{float(i):10.4f}{0.0:10.4f}{0.0:10.4f} C   0  0  0  0  0  0  0  0  0  0  0  0"
    )
for i in range(6):
    a, b = i + 1, (i + 1) % 6 + 1
    BENZENE_LINES.append(f"{a:3d}{b:3d}  4  0")
BENZENE_LINES.append("M  END")
BENZENE = "\n".join(BENZENE_LINES)


def test_parse_molfile_ethanol():
    mol = parse_molfile(ETHANOL)
    assert mol.symbols == ["C", "C", "O"]
    assert mol.bonds.shape == (2, 3)
    assert list(mol.bonds[0]) == [0, 1, 1]


def test_parse_charge_property_line():
    txt = ETHANOL.replace("M  END", "M  CHG  1   3  -1\nM  END")
    mol = parse_molfile(txt)
    assert mol.charges[2] == -1


def test_fingerprint_identical_molecules_identical():
    a = morgan_fingerprint(parse_molfile(ETHANOL))
    b = morgan_fingerprint(parse_molfile(ETHANOL))
    assert a == b and len(a) > 0


def test_fingerprint_distinguishes_molecules():
    a = morgan_fingerprint(parse_molfile(ETHANOL))
    b = morgan_fingerprint(parse_molfile(BENZENE))
    assert a != b


def test_benzene_symmetry_single_radius0_id():
    # All six aromatic ring carbons share one invariant; radius-1
    # environments are also all identical (deduplicated by bond set).
    fp = morgan_fingerprint(parse_molfile(BENZENE))
    # radius-0 id has count 6; every other environment id appears once
    assert sorted(fp.values(), reverse=True)[0] == 6


def test_dice_matrix_properties():
    fps = [
        morgan_fingerprint(parse_molfile(ETHANOL)),
        morgan_fingerprint(parse_molfile(BENZENE)),
        morgan_fingerprint(parse_molfile(ETHANOL)),
    ]
    counts = fold_fingerprints(fps, n_bits=1 << 12)
    sim = dice_similarity_matrix(counts, block=8)
    assert sim.shape == (3, 3)
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-6)
    np.testing.assert_allclose(sim, sim.T, atol=1e-6)
    np.testing.assert_allclose(sim[0, 2], 1.0, atol=1e-6)  # identical mols
    assert sim[0, 1] < 0.5  # ethanol vs benzene: low similarity


def test_dice_matches_exact_counted_dice():
    # Folded+L1 formulation == direct sum-min Dice on the folded vectors.
    rng = np.random.default_rng(0)
    c = rng.integers(0, 5, size=(7, 64)).astype(np.float32)
    sim = dice_similarity_matrix(c, block=4)
    for i in range(7):
        for j in range(7):
            num = 2.0 * np.minimum(c[i], c[j]).sum()
            den = c[i].sum() + c[j].sum()
            np.testing.assert_allclose(sim[i, j], num / den, rtol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF_SDF_DIR), reason="no reference SDFs")
def test_real_drugbank_sdf_end_to_end(tmp_path):
    import glob
    import shutil

    sub = tmp_path / "sdf"
    sub.mkdir()
    for p in sorted(glob.glob(os.path.join(REF_SDF_DIR, "*.sdf")))[:12]:
        shutil.copy(p, sub)
    out = tmp_path / "sim.csv"
    res = calculate_drug_similarity(str(sub), output_file=str(out))
    n = len(res["ids"])
    assert n >= 10
    sim = res["similarity"]
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-6)
    assert ((sim >= -1e-6) & (sim <= 1 + 1e-6)).all()
    # off-diagonal pairs of distinct approved drugs should not all be ~1
    off = sim[~np.eye(n, dtype=bool)]
    assert off.mean() < 0.9
    import csv

    with open(out) as f:
        rows = list(csv.reader(f))
    assert len(rows) == n + 1 and rows[0][1:] == list(res["ids"])
