"""Device mesh construction.

The reference scales by process-level data parallelism over a ZMQ worker pool
(SURVEY.md §2c); the TPU-native replacement is a ``jax.sharding.Mesh`` whose
axes ride ICI: ``dp`` (request/data parallel) × ``tp`` (tensor parallel within
T3/S3Gen). Multi-host extends the same mesh over DCN via jax.distributed —
the axis names and sharding rules below stay unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshAxes:
    dp: str = "dp"
    tp: str = "tp"


AXES = MeshAxes()


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Defaults: all tensor parallel (tp = n_devices) for serving a single large
    model; pass dp to split replicas. dp*tp must equal len(devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None and dp is None:
        dp, tp = 1, n
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (AXES.dp, AXES.tp))
