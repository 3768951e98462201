"""Device mesh construction for multi-chip training.

The reference is strictly single-device (reference: tip.py:10;
README.md:58 defers multi-GPU entirely).  Here scaling is native: a
``jax.sharding.Mesh`` over all chips (ICI within a slice, DCN across
hosts is handled transparently by jax), with the D-D edge-chunk axis
sharded across it — see parallel/sharded.py for the collective layout.

Two shapes are supported:

  * 1-D ``(edges,)`` (:func:`make_mesh`): every subsystem shards over the
    one axis — the default on a single slice.
  * 2-D ``(ring, edges)`` (:func:`make_mesh2`, SURVEY section 2.4's
    "ICI intra-slice / DCN multi-host" blueprint): the protein-row RING
    decomposition of the P-P GCN lives on the ``ring`` axis (its
    ppermute hops stay on the fast axis — lay ``ring`` along ICI), while
    the D-D edge-chunk shard and the EP relation partition flatten over
    BOTH axes (their only collectives are psums, which tolerate the slow
    axis).  parallel/sharded.py derives the per-subsystem specs from the
    mesh's axis names.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


EDGE_AXIS = "edges"
RING_AXIS = "ring"


def make_mesh(n_devices: Optional[int] = None, axis: str = EDGE_AXIS) -> Mesh:
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis,))


def make_mesh2(n_ring: int, n_edges: int) -> Mesh:
    """2-D (ring, edges) mesh; ring should map to the faster interconnect
    (device order is the jax enumeration: consecutive devices share ICI)."""
    devices = jax.devices()
    n = n_ring * n_edges
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(
        np.array(devices[:n]).reshape(n_ring, n_edges),
        (RING_AXIS, EDGE_AXIS),
    )


def mesh_axes(mesh: Mesh):
    """(reduce_axes, ring_axis, n_flat): the axes the edge-sharded
    loss/R-GCN psums run over (all of them), and the axis the P-P ring
    rides (the leading one)."""
    names = tuple(mesh.axis_names)
    reduce_axes = names if len(names) > 1 else names[0]
    return reduce_axes, names[0], int(np.prod(mesh.devices.shape))
