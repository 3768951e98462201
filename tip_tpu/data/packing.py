"""Edge packing: splits, type-binned sorting, degrees, and static-shape padding.

This is the TPU-shaping step the reference lacks.  All model-facing edge
buffers are:

  * **type-binned**: edges of relation ``t`` occupy the contiguous slice
    ``range_list[t] = (start, end)`` (the reference's ``get_range_list``
    layout, reference: src/utils.py:26-32);
  * **destination-sorted within each bin**, so the (relation, dst) segment
    ids of the whole buffer are globally non-decreasing and every
    aggregation is a sorted segment reduction;
  * **optionally padded** to chunk multiples per bin so Pallas kernels see
    static per-chunk shapes with no bin straddling a chunk boundary.

The 90/10 split reproduces the reference semantics (reference:
src/utils.py:35-65): per-relation Bernoulli over the unique (upper
triangular) pairs, then both directions of every kept pair enter the same
split, so a pair is never split across train/test.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class TypedEdges:
    """A type-binned edge buffer over a single node set.

    edge_index: [2, E] int32 (src, dst) — directed; undirected relations
        store both directions.
    edge_type:  [E] int32 — compact relation id in [0, n_et).
    range_list: [n_et, 2] int32 — (start, end) slice per relation.
    """

    edge_index: np.ndarray
    edge_type: np.ndarray
    range_list: np.ndarray

    @property
    def n_edges(self) -> int:
        return int(self.edge_index.shape[1])

    @property
    def n_et(self) -> int:
        return int(self.range_list.shape[0])

    def counts(self) -> np.ndarray:
        return self.range_list[:, 1] - self.range_list[:, 0]


def _ranges_from_counts(counts: np.ndarray) -> np.ndarray:
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.stack([starts, ends], axis=1).astype(np.int32)


def concat_typed(pair_list: List[np.ndarray]) -> TypedEdges:
    """Concatenate per-relation [2, nnz_t] pair arrays into one typed buffer."""
    counts = np.array([p.shape[1] for p in pair_list], dtype=np.int64)
    edge_index = (
        np.concatenate(pair_list, axis=1).astype(np.int32)
        if pair_list
        else np.zeros((2, 0), np.int32)
    )
    edge_type = np.repeat(np.arange(len(pair_list), dtype=np.int32), counts)
    return TypedEdges(edge_index, edge_type, _ranges_from_counts(counts))


def to_bidirected(pairs: np.ndarray) -> np.ndarray:
    """[2, m] pairs -> [2, 2m] with both directions (reference: src/utils.py:17-23)."""
    return np.concatenate([pairs, pairs[::-1]], axis=1)


def split_typed_edges(
    pair_list: List[np.ndarray],
    p: float = 0.9,
    seed: int = 1111,
    bidirect: bool = True,
) -> Tuple[TypedEdges, TypedEdges]:
    """Per-relation Bernoulli(p) split of unique pairs, then mirror each side.

    Matches reference ``process_edges`` (src/utils.py:35-65) semantics with a
    seeded generator for reproducibility.
    """
    rng = np.random.default_rng(seed)
    train_list, test_list = [], []
    for pairs in pair_list:
        m = pairs.shape[1]
        keep = rng.random(m) < p
        tr, te = pairs[:, keep], pairs[:, ~keep]
        if bidirect:
            tr, te = to_bidirected(tr), to_bidirected(te)
        train_list.append(tr)
        test_list.append(te)
    return concat_typed(train_list), concat_typed(test_list)


def sort_typed_edges(edges: TypedEdges) -> TypedEdges:
    """Sort within each relation bin by (dst, src).

    Because bins are contiguous and type-ordered, the resulting buffer is
    globally sorted by the segment id ``type * n_nodes + dst`` — the layout
    every sorted-segment aggregation in ops/ relies on.
    """
    src, dst = edges.edge_index
    et = edges.edge_type
    from tip_tpu.native import sort_edges_order

    n_nodes = int(max(src.max(), dst.max())) + 1 if src.size else 1
    order = sort_edges_order(et, dst, src, n_nodes)
    return TypedEdges(
        edges.edge_index[:, order].copy(), et[order].copy(), edges.range_list
    )


def in_degree(edge_index: np.ndarray, n_nodes: int) -> np.ndarray:
    """Total in-degree per destination across ALL relations.

    This is the mean-aggregation denominator: the reference aggregates with
    ``aggr='mean'`` over the whole concatenated edge list (reference:
    src/layers.py:123), so the denominator is the cross-relation in-degree.
    """
    from tip_tpu.native import bincount_i32

    return bincount_i32(edge_index[1], n_nodes)


def dense_relation_adj(edges: TypedEdges, n_nodes: int) -> np.ndarray:
    """Dense per-relation adjacency DA [n_et, n_nodes(dst), n_nodes(src)].

    ``DA[t, d, s]`` counts directed edges s->d of relation t, so the R-GCN
    neighbor binning P[t] = sum_{e in t, dst=d} x[src_e] becomes the batched
    dense matmul ``P[t] = DA[t] @ x`` (nn/rgcn.py).  This is the TPU-shaped
    form of the aggregation when the node set is small (645 drugs): the
    whole multigraph fits as one [R, n, n] tensor (~456 MB at Decagon scale)
    and the hot op is pure MXU batched GEMM — no per-edge gather/scatter at
    all.  Counts returned as uint16 (cast to the compute dtype on device;
    integers this small are exact in bfloat16).

    Replaces the edge streaming the reference does per relation
    (reference: src/layers.py:162-180) for small node sets; the chunked
    kernels (ops/pallas_segment.py) remain the path for large ones.
    """
    src, dst = edges.edge_index
    et = edges.edge_type.astype(np.int64)
    flat = (et * n_nodes + dst.astype(np.int64)) * n_nodes + src.astype(np.int64)
    counts = np.bincount(flat, minlength=edges.n_et * n_nodes * n_nodes)
    if counts.max() >= 2**16:
        raise ValueError("edge multiplicity exceeds uint16")
    return counts.astype(np.uint16).reshape(edges.n_et, n_nodes, n_nodes)


def cast_dense_adj(da: np.ndarray, dtype) -> np.ndarray:
    """Cast the count adjacency to the compute dtype, verifying exactness.

    The 'counts are exact in the compute dtype' contract (dense_relation_adj,
    nn/rgcn.py) only holds while every multiplicity round-trips: bfloat16
    represents integers exactly up to 256, float32 up to 2**24.  A lossy cast
    would silently mis-weight the aggregation, so verify instead of assuming
    (Decagon multiplicities are 0/1; this guards other datasets).
    """
    import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)

    out = da.astype(dtype)
    bad = out.astype(np.uint32) != da
    if bad.any():
        raise ValueError(
            f"edge multiplicity {int(da[bad].max())} is not exactly "
            f"representable in {np.dtype(dtype).name}; use a wider "
            "dense_dtype or the chunked kernels"
        )
    return out


def pad_dense_adj(da: np.ndarray) -> np.ndarray:
    """Zero-pad [R, n, n] relation pages to HBM tile bounds
    [R, roundup(n, 8), roundup(n, 128)].

    XLA already stores the array physically padded to these tile multiples;
    aligning the LOGICAL shape lets Pallas page DMAs run on whole tiles —
    measured 4.7 -> 3.1 ms for the full 913 MB page stream at Decagon scale
    (runs/strip_probe_bce3.out; unaligned page slices are outright rejected
    by manual DMA: 'slice must be aligned to tiling').  Pad cells are ZERO:
    inert in every consumer (counts weight nothing; the dense BCE kernels
    mask their negative draws to the true extent).
    """
    # sublane tile depth scales inversely with itemsize (f32 8, bf16 16,
    # int8 32 — narrow dtypes pack multiple rows per (8, 128) tile)
    sub = 8 * max(1, 4 // da.dtype.itemsize)
    n1 = -(-da.shape[1] // sub) * sub
    n2 = -(-da.shape[2] // 128) * 128
    if (n1, n2) == da.shape[1:]:
        return da
    return np.pad(da, ((0, 0), (0, n1 - da.shape[1]), (0, n2 - da.shape[2])))


SYM_BLOCK = 128  # square block edge of the symmetric packed layout (= lane
# width; int8 VMEM tiles are (32, 128) so a [128, 128] block is tile-exact)


def sym_block_layout(n_nodes: int, block: int = SYM_BLOCK):
    """Static upper-block-triangle table for the symmetric packed layout.

    Returns (nb, [(I, J)] with I <= J): the [n, n] plane is covered by
    nb = ceil(n / block) block rows/cols; only blocks with I <= J are
    stored — (I, J) stands for itself AND its mirror (J, I) (the D-D
    relation pages are symmetric: every undirected edge is stored in both
    directions, data/packing.py:split_typed_edges / reference
    src/utils.py:17-23)."""
    nb = -(-n_nodes // block)
    return nb, [(i, j) for i in range(nb) for j in range(i, nb)]


def sym_strip_offsets(nb: int, block: int = SYM_BLOCK):
    """Column offset of each block-row strip in the packed strip layout.

    Strip I holds the upper-triangle tail of block-row I — the CONTIGUOUS
    [block, (nb - I) * block] slice page[I*b:(I+1)*b, I*b:] — so offsets
    are the prefix sums of the decreasing strip widths."""
    widths = [(nb - i) * block for i in range(nb)]
    offs = np.concatenate([[0], np.cumsum(widths)]).astype(int)
    return offs, widths


def sym_strip_pack(da: np.ndarray, block: int = SYM_BLOCK) -> np.ndarray:
    """Pack symmetric count pages [R, n, n] -> strips [R, block, NB*block]
    int8 (NB = nb(nb+1)/2 upper-triangle blocks, nb = ceil(n/block)).

    Strip I (columns sym_strip_offsets[I]..+width) is the contiguous
    upper-triangle tail of block-row I: its first ``block`` columns are the
    diagonal block (cells stand for themselves), the rest stand for
    themselves AND their mirrors.  One [128, width] strip per block row
    keeps the consumers' MXU dots and VPU ops large (a [128, 128] block
    granularity measured ~2x slower on both units).

    At Decagon scale: 377 MB int8 vs 1.09 GB tile-padded bf16 for the
    dominant HBM stream of the training step (fused dense BCE + M-first
    R-GCN), with ~31% of the padded cells never touched.  Raises if any
    page is not symmetric or any count exceeds int8 (callers then keep
    the full tile-padded layout).
    """
    r, n, n2 = da.shape
    assert n == n2
    nb, _ = sym_block_layout(n, block)
    if da.size and int(da.max()) > 127:
        raise ValueError("count exceeds int8; use the full dense layout")
    offs, widths = sym_strip_offsets(nb, block)
    out = np.zeros((r, block, int(offs[-1])), np.int8)
    pad = nb * block - n
    for t in range(r):  # per-page to bound host memory
        page = np.pad(da[t], ((0, pad), (0, pad)))
        if not np.array_equal(page, page.T):
            raise ValueError(
                f"relation page {t} is not symmetric; the symmetric packed "
                "layout requires mirrored undirected edges"
            )
        for i in range(nb):
            out[t, :, offs[i]:offs[i + 1]] = page[
                i * block:(i + 1) * block, i * block:
            ]
    return out


def poisson_neg_thresholds_sym(
    edges: TypedEdges, n_nodes: int
) -> np.ndarray:
    """Per-relation thresholds for the SYMMETRIC fused dense BCE kernel
    (ops/pallas_dense_bce_sym.py): int32 [n_et, 8] =
    [single-rate q_1..q_4 | doubled-rate q_1..q_4] * 2^24.

    Cells in diagonal blocks draw X ~ Binomial(m_t, 1/nonpos_t) (each cell
    stands for itself — both triangle halves of a diagonal block are
    processed).  Off-diagonal stored blocks draw X ~ Binomial(m_t,
    2/nonpos_t): one draw covers the cell AND its mirror, preserving the
    pair's expected count (and per-pair loss marginal) exactly.  Four tail
    terms bound the min(X, 4) truncation bias below 2e-5 even at doubled
    rate on the densest Decagon relation.
    """
    m, nonpos = _per_relation_counts(edges, n_nodes)
    qs = _binom_tail_thresholds(m, 1.0 / nonpos, 4)
    qd = _binom_tail_thresholds(m, np.minimum(2.0 / nonpos, 1.0), 4)
    return np.concatenate([qs, qd], axis=1)


def _per_relation_counts(edges: TypedEdges, n_nodes: int):
    """(m_t directed train edges, nonpos_t non-positive cells) per relation."""
    n_et = edges.n_et
    m = np.bincount(edges.edge_type, minlength=n_et).astype(np.float64)
    keys = encode_keys(edges, n_nodes)
    if keys.size:
        order = np.argsort(keys, kind="stable")
        first = np.concatenate([[True], np.diff(keys[order]) != 0])
        distinct = np.bincount(
            edges.edge_type[order][first], minlength=n_et
        ).astype(np.float64)
    else:
        distinct = np.zeros(n_et, np.float64)
    nonpos = np.maximum(float(n_nodes) ** 2 - distinct, 1.0)
    return m, nonpos


def _binom_tail_thresholds(m, p, kmax: int) -> np.ndarray:
    """floor(P(X >= k) * 2^24) for k = 1..kmax, X ~ Binomial(m, p), via the
    log-pmf recurrence in float64 (exact tails, no scipy dependency)."""
    m = np.asarray(m, np.float64)
    p = np.asarray(p, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        log1mp = np.log1p(-p)
        pmf = np.exp(m * log1mp)  # P(X = 0)
        cdf = pmf.copy()
        qs = []
        for k in range(1, kmax + 1):
            qs.append(1.0 - cdf)
            # P(X = k) = P(X = k-1) * (m - k + 1)/k * p/(1-p)
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = np.where(
                    (m >= k) & (p < 1.0),
                    (m - k + 1) / k * p / np.maximum(1.0 - p, 1e-300),
                    0.0,
                )
            pmf = pmf * ratio
            cdf = cdf + pmf
    q = np.stack(qs, axis=1)
    return np.floor(np.clip(q, 0.0, 1.0) * (1 << 24)).astype(np.int32)


def poisson_neg_thresholds(edges: TypedEdges, n_nodes: int) -> np.ndarray:
    """Per-relation Binomial tail thresholds for the fused dense BCE kernel
    (ops/pallas_dense_bce.py).

    For relation t with m_t directed train edges over nonpos_t = n^2 - (its
    distinct positive cells), the Poissonized negative sampler draws each
    non-positive cell's count as X ~ Binomial(m_t, 1/nonpos_t), realized by
    inverse-CDF on one 24-bit uniform: count = sum_k 1[u < q_k] with
    q_k = P(X >= k), k = 1..3 — exactly min(X, 3).  Returns int32
    [n_et, 3] = floor(q_k * 2^24), computed in float64.
    """
    m, nonpos = _per_relation_counts(edges, n_nodes)
    return _binom_tail_thresholds(m, 1.0 / nonpos, 3)


def dense_pp_feasible(n_nodes: int) -> bool:
    """Whether the [n_nodes, n_nodes] dense int8 (A+I) fits a sane HBM
    budget (~1 GB).  Single source of truth for the dense P-P policy —
    shared by train/model.py:make_graph_arrays and models/pp.py."""
    return n_nodes * n_nodes * 1 <= 1.0e9


def dense_pp_parts(pp_norm_index: np.ndarray, n_nodes: int):
    """Dense (A + I) in int8 plus the D^-1/2 diagonal, factored EXACTLY.

    The cached COO normalization stores w_e = dinv[src]*dinv[dst]
    (gcn_normalize) — those products are not representable in a narrow
    dtype, but the 0/1 adjacency is, so the dense path keeps the scaling
    OUTSIDE the matmul:  A_hat @ x = dinv * ((A+I) @ (dinv * x)).  Storage
    is int8 (exact 0/1): the consumers upcast to bf16 INSIDE the dot and
    XLA fuses the convert into the operand read, so the HBM stream is the
    int8 bytes — at Decagon scale 364 MB per layer pass (was 728 MB bf16;
    measured 649 GB/s of int8 vs 652 GB/s of bf16 on the [N, N] x [N, d]
    dot = 2x less stream time), and still 4x fewer FLOPs than the
    windowed one-hot scatter kernels on MXU-shaped operands.
    """
    a1 = np.zeros((n_nodes, n_nodes), np.uint8)
    a1[pp_norm_index[1], pp_norm_index[0]] = 1
    deg = a1.sum(axis=1, dtype=np.int64)
    # A duplicated COO entry would contribute its weight TWICE in the
    # cached-normalization SpMM but collapse to one 0/1 cell here (and the
    # degree would differ) — verify instead of assuming, mirroring the D-D
    # path's cast_dense_adj exactness guard.
    if int(deg.sum()) != pp_norm_index.shape[1]:
        raise ValueError(
            "P-P normalized edge list contains duplicate entries; the dense "
            "0/1 (A+I) path cannot represent edge multiplicity — use the "
            "COO/windowed path"
        )
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1)), 0.0)
    return a1.astype(np.int8), dinv.astype(np.float32)


def max_multiplicity(edges: TypedEdges, n_nodes: int) -> int:
    """Largest (type, dst, src) duplicate count in a SORTED edge buffer.

    Drives the dense-adjacency dtype choice (train/model.py:
    preferred_dense_dtype): counts are exact in bfloat16 up to 256 and in
    float32 up to 2**24.  O(E) over the encoded keys — duplicates are
    adjacent runs because the buffer is (type, dst, src)-sorted.
    """
    keys = encode_keys(edges, n_nodes)
    if keys.size == 0:
        return 0
    diffs = np.diff(keys)
    if np.any(diffs < 0):  # adjacent-run counting needs sorted keys; every
        # shipped caller hands a build_trigraph-sorted buffer, but an
        # unsorted one would silently undercount — sort instead of crashing
        keys = np.sort(keys)
        diffs = np.diff(keys)
    change = np.flatnonzero(diffs) + 1
    bounds = np.concatenate([[0], change, [keys.size]])
    return int(np.max(np.diff(bounds)))


def encode_keys(edges: TypedEdges, n_nodes: int) -> np.ndarray:
    """Unique int64 key per edge, encoded (type, dst, src) to match the
    sort order of :func:`sort_typed_edges` — ascending over the sorted buffer."""
    src, dst = edges.edge_index.astype(np.int64)
    return (edges.edge_type.astype(np.int64) * n_nodes + dst) * n_nodes + src


@dataclass
class PaddedTypedEdges:
    """Chunk-aligned padding of a TypedEdges buffer for Pallas kernels.

    Each relation bin is padded to a multiple of ``chunk``; padded slots get
    ``dst = n_nodes`` (one past the last valid node) so a one-hot over
    ``[0, n_nodes)`` zeroes them out, and ``src = 0`` (masked by dst).
    ``chunk_type[i]`` is the relation id owning chunk ``i`` — no chunk
    straddles two relations.
    """

    src: np.ndarray  # [Ep] int32
    dst: np.ndarray  # [Ep] int32 (n_nodes for padding)
    chunk_type: np.ndarray  # [Ep // chunk] int32
    range_list: np.ndarray  # [n_et, 2] int32 ranges in the PADDED buffer
    valid: np.ndarray  # [Ep] bool
    chunk: int
    n_valid: int


def pad_typed_edges(edges: TypedEdges, n_nodes: int, chunk: int = 512) -> PaddedTypedEdges:
    from tip_tpu.native import pad_typed_fill

    counts = edges.counts()
    padded_counts = np.maximum(1, -(-counts // chunk)) * chunk
    total = int(padded_counts.sum())
    new_ranges = _ranges_from_counts(padded_counts)
    src, dst, valid = pad_typed_fill(
        edges.edge_index[0], edges.edge_index[1], edges.range_list,
        new_ranges[:, 0], total, n_nodes,
    )
    chunk_type = np.repeat(
        np.arange(edges.n_et, dtype=np.int32), padded_counts // chunk
    )
    return PaddedTypedEdges(
        src=src,
        dst=dst,
        chunk_type=chunk_type,
        range_list=new_ranges,
        valid=valid,
        chunk=chunk,
        n_valid=edges.n_edges,
    )


@dataclass
class WindowedEdges:
    """Destination-windowed, chunk-aligned edge buffer for the Pallas SpMM.

    Edges are grouped by destination window (``dst // window``); each
    window's edge list is padded to a multiple of ``chunk`` so no chunk
    straddles a window.  ``dst_local`` is the in-window destination
    (``window`` itself marks padding — one past the valid range, zero row in
    the kernel's one-hot).  Every window gets at least one chunk so its
    output block is always zero-initialized.
    """

    src: np.ndarray  # [Ep] int32 (padding: 0)
    dst_local: np.ndarray  # [Ep] int32 (padding: window)
    weight: np.ndarray  # [Ep] float32 (padding: 0)
    chunk_window: np.ndarray  # [n_chunks] int32, non-decreasing
    window: int
    chunk: int
    n_windows: int
    n_valid: int


def pad_windowed_edges(
    edge_index: np.ndarray,
    weight: Optional[np.ndarray],
    n_nodes: int,
    window: int = 512,
    chunk: int = 512,
) -> WindowedEdges:
    """Window a dst-sorted weighted edge list for the windowed scatter kernel."""
    src, dst = edge_index
    assert np.all(np.diff(dst) >= 0), "edges must be dst-sorted"
    if weight is None:
        weight = np.ones(src.shape[0], np.float32)
    n_windows = -(-n_nodes // window)
    win_of_edge = dst // window
    counts = np.bincount(win_of_edge, minlength=n_windows)
    padded_counts = np.maximum(1, -(-counts // chunk)) * chunk
    total = int(padded_counts.sum())
    ends = np.cumsum(padded_counts)
    starts = ends - padded_counts
    p_src = np.zeros(total, np.int32)
    p_dst = np.full(total, window, np.int32)
    p_w = np.zeros(total, np.float32)
    in_starts = np.cumsum(counts) - counts
    for wi in range(n_windows):
        n = counts[wi]
        s_in, s_out = in_starts[wi], starts[wi]
        p_src[s_out : s_out + n] = src[s_in : s_in + n]
        p_dst[s_out : s_out + n] = dst[s_in : s_in + n] - wi * window
        p_w[s_out : s_out + n] = weight[s_in : s_in + n]
    chunk_window = np.repeat(
        np.arange(n_windows, dtype=np.int32), padded_counts // chunk
    )
    return WindowedEdges(
        src=p_src,
        dst_local=p_dst,
        weight=p_w,
        chunk_window=chunk_window,
        window=window,
        chunk=chunk,
        n_windows=n_windows,
        n_valid=src.shape[0],
    )


# ---------------------------------------------------------------------------
# GCN normalization (host-side, cached — reference: PyG gcn_norm semantics,
# used by GCNConv(cached=True) at src/layers.py:386-387)
# ---------------------------------------------------------------------------


def gcn_normalize(
    edge_index: np.ndarray, n_nodes: int, add_self_loops: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (edge_index', weight) for D^-1/2 (A + I) D^-1/2.

    Degrees include the self loop, matching PyG's ``gcn_norm``.  The output
    edge list is destination-sorted for sorted-segment SpMM.
    """
    if add_self_loops:
        loops = np.tile(np.arange(n_nodes, dtype=np.int32), (2, 1))
        edge_index = np.concatenate([edge_index.astype(np.int32), loops], axis=1)
    deg = np.bincount(edge_index[1], minlength=n_nodes).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1)), 0.0)
    weight = (dinv[edge_index[0]] * dinv[edge_index[1]]).astype(np.float32)
    order = np.lexsort((edge_index[0], edge_index[1]))
    return edge_index[:, order].copy(), weight[order].copy()


# ---------------------------------------------------------------------------
# The packed tri-graph handed to the model
# ---------------------------------------------------------------------------


@dataclass
class TriGraphData:
    """Everything the TIP model consumes, as static-shape numpy arrays."""

    n_drug: int
    n_prot: int
    n_et: int

    # D-D multigraph (type-binned, dst-sorted within bins)
    dd_train: TypedEdges
    dd_test: TypedEdges
    dd_train_deg: np.ndarray  # [n_drug] total in-degree over train edges
    dd_train_keys: np.ndarray  # [E_train] int64 sorted (type,dst,src) keys
    dd_test_keys: np.ndarray  # [E_test] int64 sorted keys
    dd_train_bitmap: np.ndarray  # packed uint32 membership bitmap (train keys)
    dd_test_bitmap: np.ndarray  # packed uint32 membership bitmap (test keys)

    # P-P graph: raw symmetric train/test edges + cached GCN normalization
    pp_train: np.ndarray  # [2, Epp_train]
    pp_test: np.ndarray  # [2, Epp_test]
    pp_norm_index: np.ndarray  # [2, Epp_train + n_prot] dst-sorted, self loops
    pp_norm_weight: np.ndarray  # [Epp_train + n_prot] float32

    # P->D bipartite edges (protein src, drug dst), dst-sorted
    dp_edge_index: np.ndarray  # [2, Edp]
    dp_drug_deg: np.ndarray  # [n_drug]

    # Optional general drug feature matrix [n_drug, n_drug + n_mono]
    # (None => identity fast path)
    drug_feat: Optional[np.ndarray] = None
    d_norm: Optional[np.ndarray] = None  # [n_drug] divisor (ones by default)


def split_pp_edges(
    pp_edge_index: np.ndarray, p: float = 0.9, seed: int = 1111
) -> Tuple[np.ndarray, np.ndarray]:
    """Dedup symmetric P-P edges, Bernoulli split the unique pairs, re-mirror.

    Mirrors reference ``process_prot_edge`` (data/utils.py:212-229): unique
    pairs are taken as src > dst, each side of the split is re-mirrored so
    both splits are symmetric edge lists.
    """
    keep = pp_edge_index[0] > pp_edge_index[1]
    pairs = pp_edge_index[:, keep]
    rng = np.random.default_rng(seed + 7)
    mask = rng.random(pairs.shape[1]) < p
    return to_bidirected(pairs[:, mask]), to_bidirected(pairs[:, ~mask])


def build_trigraph(
    raw,
    split_rate: float = 0.9,
    seed: int = 1111,
) -> TriGraphData:
    """Pack a DecagonRaw into the model-ready TriGraphData."""
    dd_train, dd_test = split_typed_edges(raw.dd_pair_list, p=split_rate, seed=seed)
    dd_train = sort_typed_edges(dd_train)
    dd_test = sort_typed_edges(dd_test)

    pp_train, pp_test = split_pp_edges(raw.pp_edge_index, p=split_rate, seed=seed)
    pp_norm_index, pp_norm_weight = gcn_normalize(pp_train, raw.n_prot)

    dp = raw.dp_edge_index
    order = np.lexsort((dp[0], dp[1]))
    dp = dp[:, order].copy()

    # optional mono side-effect features: dense [identity | mono] block, the
    # general drug-feature path (reference: data/utils.py:109-132; the
    # default pipeline overrides to pure identity, reference: prepare.py:22)
    drug_feat = None
    if getattr(raw, "drug_mono", None) is not None:
        mono = np.asarray(raw.drug_mono.todense(), np.float32)
        drug_feat = np.concatenate(
            [np.eye(raw.n_drug, dtype=np.float32), mono], axis=1
        )

    from tip_tpu.sampling.negative import build_typed_bitmap

    train_keys = encode_keys(dd_train, raw.n_drug)
    test_keys = encode_keys(dd_test, raw.n_drug)

    return TriGraphData(
        n_drug=raw.n_drug,
        n_prot=raw.n_prot,
        n_et=len(raw.dd_pair_list),
        dd_train=dd_train,
        dd_test=dd_test,
        dd_train_deg=in_degree(dd_train.edge_index, raw.n_drug),
        dd_train_keys=train_keys,
        dd_test_keys=test_keys,
        dd_train_bitmap=build_typed_bitmap(
            dd_train.edge_index, dd_train.edge_type, raw.n_drug,
            len(raw.dd_pair_list),
        ),
        dd_test_bitmap=build_typed_bitmap(
            dd_test.edge_index, dd_test.edge_type, raw.n_drug,
            len(raw.dd_pair_list),
        ),
        pp_train=pp_train,
        pp_test=pp_test,
        pp_norm_index=pp_norm_index,
        pp_norm_weight=pp_norm_weight,
        dp_edge_index=dp,
        dp_drug_deg=in_degree(dp, raw.n_drug),
        drug_feat=drug_feat,
    )


def synthetic_trigraph(
    n_drug: int = 64,
    n_prot: int = 128,
    n_et: int = 7,
    pairs_per_et: int = 40,
    n_pp_pairs: int = 300,
    n_dp: int = 100,
    seed: int = 0,
):
    """A small random tri-graph with the same invariants, for tests/CI.

    Each relation's pairs concentrate inside a random node community so the
    graph has learnable structure (held-out edges are predictable) — a pure
    Erdos-Renyi graph would make accuracy assertions meaningless.
    """
    from tip_tpu.data.decagon import DecagonRaw

    rng = np.random.default_rng(seed)
    dd_pair_list = []
    for _ in range(n_et):
        m = int(pairs_per_et * (0.5 + rng.random()))
        community = rng.choice(n_drug, size=max(4, n_drug // 3), replace=False)
        in_comm = rng.random(m) < 0.85
        a = np.where(
            in_comm[None, :],
            rng.choice(community, size=(2, m)).astype(np.int32),
            rng.integers(0, n_drug, size=(2, m), dtype=np.int32),
        )
        keep = a[0] != a[1]
        a = a[:, keep]
        lo, hi = np.minimum(a[0], a[1]), np.maximum(a[0], a[1])
        pairs = np.unique(np.stack([lo, hi]), axis=1)
        dd_pair_list.append(pairs.astype(np.int32))
    ppa = rng.integers(0, n_prot, size=(2, n_pp_pairs), dtype=np.int32)
    ppa = ppa[:, ppa[0] != ppa[1]]
    lo, hi = np.minimum(ppa[0], ppa[1]), np.maximum(ppa[0], ppa[1])
    pp_pairs = np.unique(np.stack([hi, lo]), axis=1)  # src > dst convention
    pp_edge_index = to_bidirected(pp_pairs.astype(np.int32))
    dp = np.unique(
        np.stack(
            [
                rng.integers(0, n_prot, n_dp, dtype=np.int32),
                rng.integers(0, n_drug, n_dp, dtype=np.int32),
            ]
        ),
        axis=1,
    )
    raw = DecagonRaw(
        n_drug=n_drug,
        n_prot=n_prot,
        dd_pair_list=dd_pair_list,
        et_ids=np.arange(n_et, dtype=np.int32),
        pp_edge_index=pp_edge_index,
        dp_edge_index=dp,
    )
    return raw
