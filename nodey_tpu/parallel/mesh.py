"""Mesh construction helpers."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    axes: Dict[str, int], devices: Optional[Sequence] = None
) -> Mesh:
    """Build a Mesh from an axis-name -> size mapping.

    ``make_mesh({"dp": 2, "sp": 4})`` lays dp-major over the first 8 devices.
    Axis sizes must multiply to <= available devices; pass -1 for one axis to
    absorb the remainder.
    """
    devices = list(devices if devices is not None else jax.devices())
    names = list(axes)
    sizes = list(axes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis may be -1")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} needs {total} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[:total]).reshape(sizes)
    return Mesh(grid, axis_names=names)
