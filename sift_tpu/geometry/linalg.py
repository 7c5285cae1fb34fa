"""Small-matrix linear algebra helpers shared by the geometry stack.

jnp.linalg.eigh in float32 on TPU is markedly less accurate than
LAPACK (measured ~400x worse nullspace residuals on 9x9 DLT systems),
which breaks minimal solvers whose answer IS the nullspace. We polish
the smallest eigenvector with a few inverse-power iterations — each a
tiny dense solve — which restores near-machine-precision nullspaces
while staying batched/vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp


def smallest_eigvec(ata: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric PSD ata.

    eigh seed + `iters` inverse-power iterations on (ata + eps I).
    """
    n = ata.shape[-1]
    _, vecs = jnp.linalg.eigh(ata)
    v = vecs[..., :, 0]
    eps = 1e-7 * jnp.trace(ata) / n + 1e-30
    a = ata + eps * jnp.eye(n, dtype=ata.dtype)
    for _ in range(iters):
        v = jnp.linalg.solve(a, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                            1e-30)
    return v
