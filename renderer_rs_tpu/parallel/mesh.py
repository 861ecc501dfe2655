"""Device mesh construction for multi-chip rendering."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_device_mesh(
    n_devices: int | None = None,
    frame_axis: int | None = None,
    devices=None,
) -> Mesh:
    """Build a ('frame', 'rows') mesh over the first n devices.

    frame_axis: size of the frame-parallel axis (defaults to 2 when n is
    divisible by 2 and >= 4, else 1); 'rows' gets the rest.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if frame_axis is None:
        frame_axis = 2 if (n >= 4 and n % 2 == 0) else 1
    if n % frame_axis != 0:
        raise ValueError(f"{n} devices not divisible by frame axis {frame_axis}")
    rows = n // frame_axis
    arr = np.asarray(devices[:n]).reshape(frame_axis, rows)
    return Mesh(arr, axis_names=("frame", "rows"))
