"""Shared numeric primitives matching the reference's math library.

The reference leans on cv::hal::fastAtan2/exp32f/magnitude32f
(src/sift.cpp:424-426,632-634) and cvRound. We reproduce fastAtan2's
polynomial exactly (bin assignments in orientation/descriptor
histograms depend on it) and use round-half-even for cvRound.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# cv::hal::fastAtan2 polynomial coefficients, in degrees.
_P1 = 0.9997878412794807 * (180.0 / math.pi)
_P3 = -0.3258083974640975 * (180.0 / math.pi)
_P5 = 0.1555786518463281 * (180.0 / math.pi)
_P7 = -0.04432655554792128 * (180.0 / math.pi)
_DBL_EPS = 2.220446049250313e-16


def fast_atan2_deg(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV fastAtan2 twin: polynomial atan2 in degrees [0, 360)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    swap = ax < ay
    c = jnp.where(swap, ax / (ay + _DBL_EPS), ay / (ax + _DBL_EPS))
    c2 = c * c
    a = (((_P7 * c2 + _P5) * c2 + _P3) * c2 + _P1) * c
    a = jnp.where(swap, 90.0 - a, a)
    a = jnp.where(x < 0, 180.0 - a, a)
    a = jnp.where(y < 0, 360.0 - a, a)
    return a


def cv_round(x: jnp.ndarray) -> jnp.ndarray:
    """cvRound twin: round half to even, as int32."""
    return jnp.rint(x).astype(jnp.int32)
