"""Device-mesh helpers for data-parallel read scoring.

The reference has no parallelism of any kind (SURVEY §2.1); this engine
scales by sharding read batches over a ``dp`` mesh axis, computing
per-shard coverage histograms and breakpoint-support counts, and merging
them with deterministic integer collectives (``psum``) so that any shard
count reproduces the single-device result exactly.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))
