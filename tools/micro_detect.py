"""Throwaway micro-bench: decompose the detect stages that the <=10 ms
roadmap must attack — candidates (pallas score vs top-k stage 1 vs
stage 2), refine at detect_caps, orientation at out_caps.

Run on TPU: python tools/micro_detect.py
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np

from bench import _chain_ms, _enable_compile_cache  # noqa: E402

_enable_compile_cache()
import jax
import jax.numpy as jnp
import cv2

from sift_tpu.config import DEFAULT_CONFIG as CFG
from sift_tpu.ops import pyramid as pyr
from sift_tpu.ops import extrema as ext
from sift_tpu.ops import refine as ref
from sift_tpu.ops import orientation as ori
from sift_tpu import sift

big = cv2.imread("/root/reference/data/scene.jpg")
f0 = jnp.asarray(cv2.cvtColor(cv2.resize(big, (1920, 1080)),
                              cv2.COLOR_RGB2GRAY).astype(np.float32))

octs = jax.jit(pyr.build_gaussian_pyramid, static_argnames=("cfg",))(f0, CFG)
dogs = [jnp.asarray(d) for d in jax.jit(pyr.build_dog_pyramid)(octs)]
octs = [jnp.asarray(o) for o in octs]

res = {}


def t(name, fn):
    ms = _chain_ms(fn)
    res[name] = round(ms, 3)
    print(f"{name}: {ms:.3f} ms", flush=True)


# -- candidates decomposition, all octaves --
from sift_tpu.ops.extrema_pallas import extrema_scores_pallas

def score_only(acc):
    s = acc
    for o in range(CFG.n_octaves):
        sc = extrema_scores_pallas(_dogp(o, acc), CFG)
        s = s + sc[0, 0, 0] * 1e-9
    return s

def _dogp(o, acc):
    return dogs[o] + acc * 1e-9

@jax.jit
def _score_only(acc):
    return score_only(acc)

t("score_pallas_all_oct", _score_only)


@jax.jit
def _stage1(acc):
    s = acc
    for o in range(CFG.n_octaves):
        sc = extrema_scores_pallas(_dogp(o, acc), CFG).reshape(-1)
        n = sc.shape[0]
        blk = 4096
        if n <= 2 * blk:
            v1, _ = jax.lax.top_k(sc, min(CFG.detect_caps[o], n))
            s = s + v1[0] * 1e-9
            continue
        pad = (-n) % blk
        sp = jnp.pad(sc, (0, pad), constant_values=-1.0)
        rows = sp.reshape(-1, blk)
        v1, i1 = jax.lax.top_k(rows, min(128, CFG.detect_caps[o]))
        s = s + v1[0, 0] * 1e-9
    return s

t("score_plus_stage1", _stage1)


@jax.jit
def _full_cand(acc):
    s = acc
    for o in range(CFG.n_octaves):
        lay, r, c, v = ext.top_candidates(_dogp(o, acc),
                                          CFG.detect_caps[o], CFG)
        s = s + jnp.sum(r[:2]).astype(jnp.float32) * 1e-9
    return s

t("candidates_full", _full_cand)


# -- refine at detect_caps --
@jax.jit
def _refine(acc):
    s = acc
    for o in range(CFG.n_octaves):
        lay, r, c, v = ext.top_candidates(_dogp(o, acc),
                                          CFG.detect_caps[o], CFG)
        rf = ref.refine_candidates(dogs[o], lay, r, c, v, CFG)
        s = s + jnp.sum(rf.xr[:2]) * 1e-9
    return s

t("candidates_plus_refine", _refine)


# -- orientation at REAL out_caps sizes (the facade's compaction) --
@jax.jit
def _ori_outcaps(acc):
    s = acc
    for o in range(CFG.n_octaves):
        lay, r, c, v = ext.top_candidates(_dogp(o, acc),
                                          CFG.detect_caps[o], CFG)
        rf = ref.refine_candidates(dogs[o], lay, r, c, v, CFG)
        out_cap = CFG.out_caps[o]
        mscore = jnp.where(rf.valid, jnp.abs(rf.contr) + 10.0, -1.0)
        _, midx = jax.lax.top_k(mscore, out_cap)
        rf = ref.Refined(*(a[midx] for a in rf))
        nl = CFG.n_octave_layers
        scl = CFG.sigma * jnp.exp2((rf.layer.astype(jnp.float32) + rf.xi) / nl)
        ang, ok = ori.orientation_peaks(octs[o], rf.layer, rf.r, rf.c,
                                        scl, rf.valid, CFG,
                                        hist_impl=CFG.ori_hist_impl)
        s = s + jnp.sum(ang[:2, 0]) * 1e-9
    return s

t("plus_orientation_outcaps", _ori_outcaps)

res["deltas"] = {
    "stage1_topk": round(res["score_plus_stage1"]
                         - res["score_pallas_all_oct"], 3),
    "stage2_topk": round(res["candidates_full"]
                         - res["score_plus_stage1"], 3),
    "refine": round(res["candidates_plus_refine"]
                    - res["candidates_full"], 3),
    "orientation_at_outcaps": round(res["plus_orientation_outcaps"]
                                    - res["candidates_plus_refine"], 3),
}
print(json.dumps(res))
