"""Device mesh construction helpers.

One axis name vocabulary for the whole framework:
  "data"  — frame/pair data parallelism (front-end, matching)
  "model" — intra-problem sharding (matcher query tiles, BA camera
            blocks / Schur tiles)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Sequence[int],
              axis_names: Tuple[str, ...] = ("data", "model"),
              devices=None) -> Mesh:
    """Build a Mesh of the given logical shape over available devices."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names[:len(shape)])


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    return make_mesh((n,), ("data",), devices)
