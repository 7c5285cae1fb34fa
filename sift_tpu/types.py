"""Core pytree types.

The reference carries keypoints as std::vector<cv::KeyPoint> with
dynamic length (src/sift.cpp:59-91). XLA wants static shapes, so
keypoints live in fixed-capacity struct-of-arrays with a validity mask.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Keypoints:
    """Padded keypoint batch. All fields are (N,) arrays.

    Field semantics mirror cv::KeyPoint as the reference fills it
    (src/sift.cpp:381-385): x/y in base-image coordinates, size the
    full-resolution diameter, angle in degrees (the reference's
    360-minus convention), response = |contrast|. octave/layer are
    kept unpacked (the reference bit-packs them into kpt.octave,
    src/sift.cpp:383). r/c are the integer extremum coordinates in
    octave space; xi the subpixel scale offset.
    """

    x: jnp.ndarray
    y: jnp.ndarray
    size: jnp.ndarray
    angle: jnp.ndarray
    response: jnp.ndarray
    octave: jnp.ndarray   # int32
    layer: jnp.ndarray    # int32
    r: jnp.ndarray        # int32, octave-space row
    c: jnp.ndarray        # int32, octave-space col
    valid: jnp.ndarray    # bool

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def zeros(n: int) -> "Keypoints":
        f = jnp.zeros((n,), jnp.float32)
        i = jnp.zeros((n,), jnp.int32)
        return Keypoints(x=f, y=f, size=f, angle=f, response=f,
                         octave=i, layer=i, r=i, c=i,
                         valid=jnp.zeros((n,), bool))

    def gather(self, idx: jnp.ndarray) -> "Keypoints":
        return jax.tree_util.tree_map(lambda a: a[idx], self)

    @staticmethod
    def concatenate(parts: Tuple["Keypoints", ...]) -> "Keypoints":
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts)
