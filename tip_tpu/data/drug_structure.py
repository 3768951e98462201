"""Drug-structure similarity: Morgan/ECFP fingerprints + Dice matrix.

TPU-native rebuild of the reference's drug-structure extra
(reference: data/drug_structure/data_deepddi.py:25-46), which computes a
pairwise Dice-similarity matrix over DrugBank SDF files using RDKit counted
Morgan fingerprints (radius 2).  That tool is O(N^2) Python with a nested
per-pair RDKit loop; here the pairwise stage is one blocked device
computation.

Design (not a port):

* **Fingerprints** — if ``rdkit`` is importable we use it for exact
  reference parity.  Otherwise a built-in pure-numpy ECFP is used: a
  V2000 molfile parser, Tarjan bridge-finding for ring membership, standard
  ECFP atom invariants (atomic number, heavy degree, H count, formal
  charge, ring flag) and iterative neighbourhood hashing with bond-set
  deduplication.  Identifiers differ from RDKit's internal hashes, but the
  *environment structure* (and hence the similarity geometry) matches; two
  identical molecules score 1.0 in both.
* **Similarity** — counted fingerprints are folded into a dense
  ``[n_drugs, n_bits]`` count matrix and the full Dice matrix is computed
  on device from the identity ``dice(a, b) = 1 - |a - b|_1 / (|a|_1 + |b|_1)``
  (for non-negative counts), i.e. one blocked pairwise-L1 — no per-pair
  host loop.
"""

from __future__ import annotations

import csv
import glob
import os
from dataclasses import dataclass
from typing import Dict, List, Sequence

import numpy as np

try:  # exact-parity path when available (not in the TPU image)
    from rdkit import Chem, DataStructs  # type: ignore
    from rdkit.Chem import AllChem  # type: ignore

    HAS_RDKIT = True
except Exception:  # pragma: no cover - rdkit absent in CI image
    HAS_RDKIT = False

# ---------------------------------------------------------------------------
# Minimal V2000 molfile parsing
# ---------------------------------------------------------------------------

# Default valences used to derive implicit hydrogen counts (standard organic
# subset; multi-valent S/P resolve to the smallest valence >= bond sum).
_VALENCES = {
    "H": (1,), "B": (3,), "C": (4,), "N": (3,), "O": (2,), "F": (1,),
    "Si": (4,), "P": (3, 5), "S": (2, 4, 6), "Cl": (1,), "Br": (1,), "I": (1,),
}

_ATOMIC_NUM = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "K": 19, "Ca": 20, "Fe": 26, "Co": 27, "Cu": 29,
    "Zn": 30, "As": 33, "Se": 34, "Br": 35, "Ag": 47, "I": 53, "Pt": 78,
    "Au": 79, "Hg": 80, "Bi": 83,
}


@dataclass
class Mol:
    """A parsed molecule: atom symbols/charges and typed bonds."""

    symbols: List[str]
    charges: np.ndarray            # [n_atoms] int
    bonds: np.ndarray              # [n_bonds, 3] int: a1, a2, order (0-based)

    @property
    def n_atoms(self) -> int:
        return len(self.symbols)


def parse_molfile(text: str) -> Mol:
    """Parse a V2000 molfile (the format of the reference's SDF files)."""
    lines = text.splitlines()
    if len(lines) < 4:
        raise ValueError("molfile too short")
    counts = lines[3]
    n_atoms = int(counts[0:3])
    n_bonds = int(counts[3:6])
    symbols: List[str] = []
    charges = np.zeros(n_atoms, dtype=np.int64)
    for i in range(n_atoms):
        ln = lines[4 + i]
        symbols.append(ln[31:34].strip())
        old_chg = int(ln[36:39]) if len(ln) >= 39 and ln[36:39].strip() else 0
        if old_chg:  # legacy charge column: 1..7 => +3..-3 (4 = radical)
            charges[i] = {1: 3, 2: 2, 3: 1, 5: -1, 6: -2, 7: -3}.get(old_chg, 0)
    bonds = np.zeros((n_bonds, 3), dtype=np.int64)
    for i in range(n_bonds):
        ln = lines[4 + n_atoms + i]
        bonds[i] = (int(ln[0:3]) - 1, int(ln[3:6]) - 1, int(ln[6:9]))
    # 'M  CHG' property lines override the legacy charge column entirely.
    chg_entries: List[tuple] = []
    for ln in lines[4 + n_atoms + n_bonds:]:
        if ln.startswith("M  CHG"):
            fields = ln.split()
            n = int(fields[2])
            for k in range(n):
                chg_entries.append((int(fields[3 + 2 * k]) - 1,
                                    int(fields[4 + 2 * k])))
        elif ln.startswith("M  END"):
            break
    if chg_entries:
        charges[:] = 0
        for idx, chg in chg_entries:
            charges[idx] = chg
    return Mol(symbols=symbols, charges=charges, bonds=bonds)


def _read_sdf_first_mol(path: str) -> Mol:
    with open(path) as f:
        text = f.read()
    return parse_molfile(text.split("$$$$")[0])


# ---------------------------------------------------------------------------
# Built-in ECFP (counted Morgan) fingerprints
# ---------------------------------------------------------------------------

def _ring_bonds(n_atoms: int, bonds: np.ndarray) -> np.ndarray:
    """Boolean per-bond ring membership: a bond is in a ring iff it is not a
    bridge of the molecular graph (iterative Tarjan bridge-finding)."""
    adj: List[List[tuple]] = [[] for _ in range(n_atoms)]
    for bi, (a, b, _t) in enumerate(bonds):
        adj[int(a)].append((int(b), bi))
        adj[int(b)].append((int(a), bi))
    disc = [-1] * n_atoms
    low = [0] * n_atoms
    is_bridge = np.zeros(len(bonds), dtype=bool)
    timer = 0
    for root in range(n_atoms):
        if disc[root] != -1:
            continue
        stack = [(root, -1, iter(adj[root]))]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            v, pbond, it = stack[-1]
            advanced = False
            for (to, bi) in it:
                if bi == pbond:
                    continue
                if disc[to] == -1:
                    disc[to] = low[to] = timer
                    timer += 1
                    stack.append((to, bi, iter(adj[to])))
                    advanced = True
                    break
                low[v] = min(low[v], disc[to])
            if not advanced:
                stack.pop()
                if stack:
                    parent = stack[-1][0]
                    low[parent] = min(low[parent], low[v])
                    if low[v] > disc[parent]:
                        is_bridge[pbond] = True
    in_ring = ~is_bridge
    return in_ring


def _implicit_h(symbols: Sequence[str], charges: np.ndarray,
                bonds: np.ndarray) -> np.ndarray:
    """Implicit hydrogen counts from default valences.

    The reference calls ``AllChem.AddHs`` so hydrogens participate in its
    environments; standard ECFP instead carries the H count in the atom
    invariant — that is what we do (documented deviation)."""
    n = len(symbols)
    order_sum = np.zeros(n, dtype=np.int64)
    for a, b, t in bonds:
        o = 1.5 if t == 4 else float(t)  # aromatic ~ 1.5
        order_sum[a] += int(np.ceil(o))
        order_sum[b] += int(np.ceil(o))
    nh = np.zeros(n, dtype=np.int64)
    for i, sym in enumerate(symbols):
        vals = _VALENCES.get(sym)
        if vals is None:
            continue  # metals etc.: no implicit H
        # charge convention: cations of N/P gain a valence slot (NH4+),
        # anions/cations of O/S/C etc. lose one (O-, C+).
        shift = charges[i] if sym in ("N", "P") else -abs(charges[i])
        adj_vals = [v + shift for v in vals]
        for v in adj_vals:
            if order_sum[i] <= v:
                nh[i] = v - order_sum[i]
                break
    return nh


def _hash64(vals: Sequence[int]) -> int:
    """Deterministic order-sensitive 63-bit mix (FNV-style over int64)."""
    h = 0xCBF29CE484222325
    for v in vals:
        h ^= (int(v) & 0xFFFFFFFFFFFFFFFF)
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h >> 1


def morgan_fingerprint(mol: Mol, radius: int = 2) -> Dict[int, int]:
    """Counted ECFP identifiers -> counts (built-in path).

    Semantics mirror counted Morgan fingerprints: each atom emits its
    environment identifier at every radius 0..``radius``; environments of
    radius >= 1 covering an identical bond set are deduplicated (one count).
    """
    n = mol.n_atoms
    if n == 0:
        return {}
    ring = _ring_bonds(n, mol.bonds)
    degree = np.zeros(n, dtype=np.int64)
    atom_ring = np.zeros(n, dtype=bool)
    nbrs: List[List[tuple]] = [[] for _ in range(n)]
    for bi, (a, b, t) in enumerate(mol.bonds):
        a, b, t = int(a), int(b), int(t)
        degree[a] += 1
        degree[b] += 1
        if ring[bi]:
            atom_ring[a] = atom_ring[b] = True
        nbrs[a].append((b, t, bi))
        nbrs[b].append((a, t, bi))
    nh = _implicit_h(mol.symbols, mol.charges, mol.bonds)
    ids = [
        _hash64((
            _ATOMIC_NUM.get(s, 0), int(degree[i]), int(nh[i]),
            int(mol.charges[i]), int(atom_ring[i]),
        ))
        for i, s in enumerate(mol.symbols)
    ]
    env_bonds: List[frozenset] = [frozenset() for _ in range(n)]
    counts: Dict[int, int] = {}
    seen_envs: Dict[frozenset, int] = {}
    for i in ids:  # radius-0: every atom contributes
        counts[i] = counts.get(i, 0) + 1
    for _r in range(radius):
        new_ids = list(ids)
        new_env = list(env_bonds)
        for a in range(n):
            if not nbrs[a]:
                continue
            parts = sorted((t, ids[b]) for (b, t, _bi) in nbrs[a])
            new_ids[a] = _hash64([ids[a]] + [x for p in parts for x in p])
            cover = set(env_bonds[a])
            for (b, t, bi) in nbrs[a]:
                cover.add(bi)
                cover |= env_bonds[b]
            new_env[a] = frozenset(cover)
        ids, env_bonds = new_ids, new_env
        for a in range(n):
            env = env_bonds[a]
            if not env:
                continue
            if env in seen_envs:
                continue  # identical environment already counted
            seen_envs[env] = ids[a]
            counts[ids[a]] = counts.get(ids[a], 0) + 1
    return counts


def _rdkit_fingerprint(path: str) -> Dict[int, int]:  # pragma: no cover
    mol = Chem.MolFromMolFile(path)
    mol = AllChem.AddHs(mol)
    fp = AllChem.GetMorganFingerprint(mol, 2)
    return dict(fp.GetNonzeroElements())


def fingerprint_file(path: str, radius: int = 2) -> Dict[int, int]:
    """Counted Morgan fingerprint of the first molecule in an SDF file."""
    if HAS_RDKIT:  # pragma: no cover - exact reference parity when present
        return _rdkit_fingerprint(path)
    return morgan_fingerprint(_read_sdf_first_mol(path), radius=radius)


# ---------------------------------------------------------------------------
# Folding + on-device pairwise Dice
# ---------------------------------------------------------------------------

def fold_fingerprints(fps: Sequence[Dict[int, int]],
                      n_bits: int = 1 << 15) -> np.ndarray:
    """Fold counted fingerprints into a dense [n_mols, n_bits] count matrix."""
    out = np.zeros((len(fps), n_bits), dtype=np.float32)
    for i, fp in enumerate(fps):
        for ident, c in fp.items():
            out[i, ident % n_bits] += c
    return out


def dice_similarity_matrix(counts: np.ndarray, block: int = 256) -> np.ndarray:
    """Full pairwise Dice matrix on device.

    For non-negative count vectors, ``2*sum(min(a,b)) = |a|+|b| - |a-b|_1``,
    so ``dice = 1 - |a-b|_1 / (|a|+|b|)`` — computed as a blocked pairwise
    L1 (one fused broadcast-abs-reduce per block pair on the VPU) instead of
    the reference's O(N^2) Python pair loop."""
    import jax
    import jax.numpy as jnp

    n = counts.shape[0]
    pad = (-n) % block
    c = np.pad(counts, ((0, pad), (0, 0)))
    totals = c.sum(axis=1)
    nb = c.shape[0] // block
    cb = jnp.asarray(c.reshape(nb, block, -1))
    tb = jnp.asarray(totals.reshape(nb, block))

    @jax.jit
    def pair_block(a, b):  # [block, F], [block, F] -> [block, block] L1
        return jnp.abs(a[:, None, :] - b[None, :, :]).sum(-1)

    out = np.zeros((nb * block, nb * block), dtype=np.float32)
    for i in range(nb):
        for j in range(i, nb):
            l1 = np.asarray(pair_block(cb[i], cb[j]))
            denom = np.asarray(tb[i])[:, None] + np.asarray(tb[j])[None, :]
            d = 1.0 - l1 / np.maximum(denom, 1.0)
            out[i * block:(i + 1) * block, j * block:(j + 1) * block] = d
            out[j * block:(j + 1) * block, i * block:(i + 1) * block] = d.T
    return out[:n, :n]


def calculate_drug_similarity(input_dir: str, drug_dir: str | None = None,
                              output_file: str | None = None,
                              n_bits: int = 1 << 15) -> Dict[str, np.ndarray]:
    """Pairwise Dice similarity over a directory of SDF files.

    API analog of the reference tool (data/drug_structure/data_deepddi.py:25)
    — same inputs (directories of ``<DrugBankID>.sdf``), same output (a CSV
    matrix of Dice similarities) — but fingerprints once per file (the
    reference recomputes both fingerprints inside the pair loop) and runs
    the O(N^2) similarity stage on device.
    """
    paths = sorted(glob.glob(os.path.join(input_dir, "*")))
    ids, fps = [], []
    for p in paths:
        try:
            fps.append(fingerprint_file(p))
        except (ValueError, IndexError):
            continue  # unparseable entry — skip, as rdkit would return None
        ids.append(os.path.basename(p).split(".")[0])
    counts = fold_fingerprints(fps, n_bits=n_bits)
    sim = dice_similarity_matrix(counts)
    if output_file:
        with open(output_file, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([""] + ids)
            for i, did in enumerate(ids):
                w.writerow([did] + [f"{x:.6f}" for x in sim[i]])
    return {"ids": np.array(ids), "similarity": sim}
