"""Incremental SfM back-end: bundle adjustment, PnP, pose graphs.

New capability per the north star (BASELINE.json): the reference ends
at a 2-D homography; this package adds the 3-D reconstruction stack,
built TPU-first — static-shape masked observation tables, batched
small-block linear algebra, and a matrix-free Schur-complement bundle
adjuster whose hot loop is segment-sums + batched 3x3 solves, the
exact shape that shards over device meshes with psum.
"""

from sift_tpu.sfm.ba import BAProblem, bundle_adjust, reproj_rmse

__all__ = ["BAProblem", "bundle_adjust", "reproj_rmse"]
