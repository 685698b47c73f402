"""Device-mesh construction for multi-chip/multi-host runs.

The canonical mesh for this framework is (dp, tp) = (batch/channel,
time-block): long multi-channel waveforms shard channels over ``dp`` and the
time axis over ``tp``; framed transforms exchange overlap-save halos between
``tp`` neighbors over ICI (SURVEY.md §5.7/§5.8).  The reference has no
distribution layer at all (SURVEY.md §2.10) — this is new design.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: tuple[int, ...] | int | None = None,
              axis_names: tuple[str, ...] = ("dp", "tp")) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` uses all devices on one axis per name (last axis gets
    the remainder).  An int means all devices on a 1-D mesh of that size.
    """
    devices = jax.devices()
    if shape is None:
        if len(axis_names) == 1:
            shape = (len(devices),)
        else:
            dp = max(1, len(devices) // 2)
            shape = (dp, len(devices) // dp)
            axis_names = axis_names[:2]
    elif isinstance(shape, int):
        shape = (shape,)
        axis_names = axis_names[-1:]
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names[:len(shape)])
