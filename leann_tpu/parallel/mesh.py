"""Device-mesh helpers.

The reference is single-node with ZMQ process parallelism only (SURVEY.md
§2.5); multi-device scaling here is a *new* capability. Conventions:

* ``gp`` — graph-parallel axis: index shards (graph rows, PQ codes, token
  rows) are block-partitioned across it; query-time frontiers are combined
  with psum/all_gather over ICI (sharded_search.py).
* ``dp`` / ``tp`` — data / tensor axes for encoder fine-tuning (train.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: Sequence[Tuple[str, int]], devices: Optional[list] = None) -> Mesh:
    """make_mesh([("dp", 2), ("tp", 4)]) -> Mesh over the first prod(sizes)
    devices, reshaped to the axis sizes."""
    devices = devices if devices is not None else jax.devices()
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    need = int(np.prod(sizes))
    if len(devices) < need:
        raise ValueError(f"need {need} devices for mesh {axes}, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(sizes)
    return Mesh(dev, tuple(names))


def graph_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return make_mesh([("gp", n)], devices)


def serving_mesh(dp: int, gp: int) -> Mesh:
    """(dp, gp) mesh for serving scale-out: the index is sharded over ``gp``
    and replicated over ``dp``; the query batch splits over ``dp`` so
    throughput scales with dp while each query still searches the full
    gp-sharded graph."""
    return make_mesh([("dp", dp), ("gp", gp)])
