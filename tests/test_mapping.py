"""Config-5 end-to-end gate: rendered corpus-derived sequence through
the FULL pipeline — detect/describe -> sequential matching ->
incremental SfM -> loop-closure detection -> pose-graph correction ->
closure-aware global BA -> export — with exact ground-truth poses from
the renderer (ATE gate) and reprojection gating.

The reference's entire end-to-end scope is a two-image demo
(src/main.cpp:10-72); this is the map-scale flow the north star
(BASELINE.json configs 4-5) adds.
"""

import os

import numpy as np
import pytest

from sift_tpu.sfm.mapping import (mapping_ate, render_corner_sequence,
                                  run_mapping)


@pytest.mark.slow
def test_mapping_end_to_end(tmp_path):
    frames, k, gt = render_corner_sequence(n_frames=10,
                                           size=(200, 268), seed=3)
    res = run_mapping(frames, k, pair_window=2, min_gap=4,
                      closure_candidates=1,
                      export_prefix=str(tmp_path / "map"))
    s = res.stats
    assert s["n_registered"] >= 9, s
    assert s["n_closures"] >= 1, s
    assert s["n_closure_edges"] >= 1, s
    assert s["n_points"] >= 50, s
    assert s["reproj_rmse"] <= 4e-3, s

    ate = mapping_ate(res, gt)
    # trajectory radius 0.9 world units; final ATE must be a small
    # fraction of it, and the closure-aware final map must not be
    # worse than raw odometry beyond noise
    assert ate["ate_final"] <= 0.07, ate
    assert ate["ate_final"] <= ate["ate_odometry"] * 1.25 + 1e-3, ate

    exp = s["export"]
    assert os.path.exists(exp["ply"]) and os.path.exists(exp["json"])
    # exported cloud is the gated map
    with open(exp["ply"]) as f:
        head = f.read(200)
    assert "element vertex" in head


def test_renderer_geometry():
    """Rendered frames obey the pinhole model they claim: a world
    point on the back wall projects where K [R|t] says it should."""
    frames, k, gt = render_corner_sequence(n_frames=3, size=(120, 160))
    assert frames.shape == (3, 120, 160)
    assert frames.max() > 50          # textured, not blank
    for f in frames:
        assert (f > 0).mean() > 0.9   # planes cover the frame
    # gt poses look at the corner: +z depth of the wall center ~6
    import jax.numpy as jnp
    from sift_tpu.geometry import lie
    for c in gt:
        r = np.asarray(lie.so3_exp(jnp.asarray(c[:3], jnp.float32)))
        xc = r @ np.array([0.0, 0.0, 6.0]) + c[3:]
        assert 4.0 < xc[2] < 8.0
