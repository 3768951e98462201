"""Device mesh construction for multi-chip training.

The reference is strictly single-device (reference: tip.py:10;
README.md:58 defers multi-GPU entirely).  Here scaling is native: a 1-D
``jax.sharding.Mesh`` over all chips (ICI within a slice, DCN across
hosts is handled transparently by jax), with the D-D edge-chunk axis
sharded across it — see parallel/sharded.py for the collective layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


EDGE_AXIS = "edges"


def make_mesh(n_devices: Optional[int] = None, axis: str = EDGE_AXIS) -> Mesh:
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis,))
