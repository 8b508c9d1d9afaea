"""Device-mesh construction for sharded search and training.

The reference delegates data sharding to Milvus (`num_shards=4`,
indexing.py:234-239) and never tests it.  Here sharding is an explicit
`jax.sharding.Mesh` with two axes:

- ``shard``: the corpus axis — embeddings / sparse rows / metadata
  columns are split along rows; per-shard top-k merges over ICI.
- ``data``: the query/batch axis — request batches ride it, and the
  trainer uses it as the DP axis (with ``shard`` doubling as the TP
  axis for model parallelism).

Tests exercise the same code on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8`` — strictly better than
the reference's untested sharding, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def build_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (shard, data) mesh over the given (or all) devices.

    ``mesh_shape=None`` puts every device on the corpus-shard axis —
    the right default for retrieval, where corpus >> query batch.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    shape: Tuple[int, int] = config.mesh_shape or (len(devices), 1)
    if shape[0] * shape[1] != len(devices):
        raise ValueError(
            f"mesh shape {shape} does not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (config.shard_axis, config.data_axis))


def single_device_mesh() -> Mesh:
    """1x1 mesh — the degenerate case so one code path serves all sizes."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("shard", "data"))


def corpus_sharding(mesh: Mesh, ndim: int = 2, axis: str = "shard") -> NamedSharding:
    """Rows split over the corpus axis; trailing dims replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    return NamedSharding(mesh, P(*([None] * ndim)))


def pad_to_shards(arr: np.ndarray, num_shards: int, fill=0) -> np.ndarray:
    """Pad axis 0 so it divides evenly across shards (padding rows are
    masked out by the validity mask, never scored)."""
    n = arr.shape[0]
    rem = (-n) % num_shards
    if rem == 0:
        return arr
    pad = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


__all__ = [
    "build_mesh",
    "single_device_mesh",
    "corpus_sharding",
    "replicated",
    "pad_to_shards",
]
