"""Headline benchmark: detect+describe+match at 1080p, frames/s/chip.

Prints ONE JSON line:
  {"metric": "detect_describe_match_1080p", "value": <frames/s>,
   "unit": "frames/s/chip", "vs_baseline": <x over reference CPU>}

Baseline denominator: the reference C++ pipeline (canhld94/SIFT-GPU)
measured on this machine at 1920x1080 — 10.28 s per frame for
SIFT_NCL (pyramid+detect+describe; matching adds <1% at these
keypoint counts). See BASELINE.md.

Timing methodology (see memory: axon tunnel quirks):
`jax.block_until_ready` does not actually wait through the remote TPU
tunnel and identical calls may be memoized server-side, so we chain k
pipeline iterations with device-side data dependence between them,
pull one scalar to the host, and report the slope between k=1 and
k=K (cancels the ~30 ms round-trip intercept).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_SECONDS_PER_FRAME_1080P = 10.28  # BASELINE.md, measured refsift

PREFLIGHT_TIMEOUT_S = int(os.environ.get("SIFT_TPU_PREFLIGHT_TIMEOUT", "180"))
# Total recovery window: keep re-probing a wedged tunnel this long
# before giving up (VERDICT r4 #2 — a 180s one-shot give-up shipped a
# 0.0 headline two rounds running while the wedge cleared minutes
# later in manual sessions).
PREFLIGHT_BUDGET_S = int(os.environ.get("SIFT_TPU_PREFLIGHT_BUDGET", "1800"))
PREFLIGHT_RETRY_SLEEP_S = int(
    os.environ.get("SIFT_TPU_PREFLIGHT_RETRY_SLEEP", "120"))

# exit 7 = host has no TPU at all (backend resolved, but to cpu) —
# retrying cannot help, so the caller fails fast instead of burning
# the recovery budget. A hang/timeout = tunnel wedge — retryable.
_PREFLIGHT_SRC = """
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp, numpy as np
d = jax.devices()
if jax.default_backend() != "tpu":
    print(f"no TPU: backend={jax.default_backend()} devices={d}")
    sys.exit(7)
x = jnp.ones((256, 256), jnp.bfloat16)
v = float(np.asarray(jax.jit(lambda a: a @ a)(x))[0, 0])
assert v == 256.0, v
print(f"backend={jax.default_backend()} devices={len(d)} "
      f"init_s={time.time()-t0:.1f}")
"""


def preflight(timeout_s: int = PREFLIGHT_TIMEOUT_S,
              headline: bool = True) -> None:
    """Bounded backend-init probe in a subprocess.

    The axon TPU tunnel can wedge so hard that ``jax.devices()`` never
    returns (round 3 shipped rc=1 with zero diagnostics — VERDICT.md
    round-3 weak #1). ``jax.devices()`` cannot be interrupted
    in-process, so probe in a child with a hard timeout.

    A wedge is usually transient: the round-4 manual session saw the
    tunnel recover within minutes of a 180s-probe failure. So this is
    wedge-RESISTANT, not just wedge-aware: on a retryable failure
    (hang or init error) it re-probes every ``PREFLIGHT_RETRY_SLEEP_S``
    until ``PREFLIGHT_BUDGET_S`` (env ``SIFT_TPU_PREFLIGHT_BUDGET``,
    default 30 min) is exhausted. A host with no TPU at all (probe
    exit 7: backend resolved, to cpu) fails fast — retrying cannot
    attach a chip.

    On final failure in headline mode, emit the headline JSON line
    with a machine-readable ``backend_unavailable`` marker (including
    the probe-attempt log proving the backend was down for the whole
    budget) and exit 0 so the driver's round artifact is a diagnosed
    record, not a silent rc=1. Non-headline modes (--stages/--batch/
    ...) exit 3 instead: their artifact files are NOT written, and a
    parent that treated exit 0 as "artifact refreshed" would otherwise
    ship stale data. Orchestrators that preflight once themselves
    should pass --no-preflight to children (tools/hw_artifacts.py
    does).
    """
    result = probe_backend(timeout_s)
    if result is None:
        # drop a stale failure marker from an earlier wedge — leaving
        # a value-0.0 BENCH_PREFLIGHT.json next to a green headline
        # misreports HEAD's state
        if os.path.exists("BENCH_PREFLIGHT.json"):
            os.remove("BENCH_PREFLIGHT.json")
        return
    if headline:
        result = {
            "metric": "detect_describe_match_1080p",
            "value": 0.0,
            "unit": "frames/s/chip",
            "vs_baseline": 0.0,
            **result,
        }
    with open("BENCH_PREFLIGHT.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    sys.exit(0 if headline else 3)


def probe_backend(timeout_s: int = PREFLIGHT_TIMEOUT_S):
    """The retrying probe behind ``preflight``: returns None when the
    TPU answered, else a ``backend_unavailable`` record with the
    attempt log. Shared with tools/hw_artifacts.py."""
    import subprocess
    deadline = time.monotonic() + PREFLIGHT_BUDGET_S
    attempts = []
    attempt = 0
    while True:
        attempt += 1
        t0 = time.monotonic()
        retryable = True
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PREFLIGHT_SRC],
                capture_output=True, text=True, timeout=timeout_s)
            if r.returncode == 0:
                print(f"# preflight ok (attempt {attempt}): "
                      f"{r.stdout.strip()}", file=sys.stderr)
                return
            if r.returncode == 7:
                detail = (r.stdout.strip().splitlines() or ["no TPU"])[-1]
                reason = "no_tpu_on_host"
                retryable = False
            else:
                detail = ((r.stderr.strip().splitlines() or ["unknown"])
                          [-1][:500])
                reason = f"backend init failed rc={r.returncode}"
        except subprocess.TimeoutExpired:
            detail = (f"jax backend init did not complete within "
                      f"{timeout_s}s (axon tunnel wedge; see "
                      "ARCHITECTURE.md round-2/3 findings)")
            reason = "backend init timeout"
        attempts.append({"attempt": attempt, "reason": reason,
                         "probe_s": round(time.monotonic() - t0, 1)})
        remaining = deadline - time.monotonic()
        if not retryable or remaining <= PREFLIGHT_RETRY_SLEEP_S:
            break
        print(f"# preflight attempt {attempt} failed ({reason}); "
              f"retrying in {PREFLIGHT_RETRY_SLEEP_S}s "
              f"({remaining:.0f}s of budget left)", file=sys.stderr)
        time.sleep(PREFLIGHT_RETRY_SLEEP_S)
    return {
        "error": "backend_unavailable",
        "error_reason": reason,
        "error_detail": detail,
        "budget_s": PREFLIGHT_BUDGET_S,
        "attempts": attempts,
    }


def _enable_compile_cache() -> None:
    import jax
    cache = os.path.expanduser("~/.cache/sift_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _chain_ms(fn, k: int = 8) -> float:
    """ms/iteration from the k-vs-1 slope of device-dependent chained
    calls of fn(acc) -> acc (cancels the ~30 ms tunnel round trip and
    defeats server-side memoization; see module docstring). The single
    timing methodology for every mode in this file."""
    import jax.numpy as jnp

    def run(kk):
        t0 = time.perf_counter()
        acc = jnp.float32(0.1)
        for _ in range(kk):
            acc = fn(acc)
        float(np.asarray(acc))
        return time.perf_counter() - t0
    run(1)
    r1 = min(run(1) for _ in range(3))
    rk = min(run(k) for _ in range(2))
    return 1000.0 * (rk - r1) / (k - 1)


def bench_stages() -> None:
    """Per-stage chained timings -> BENCH_STAGES.json (one command
    reproduces every number in BASELINE.md's stage tables)."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from sift_tpu import sift
    from sift_tpu.config import DEFAULT_CONFIG as CFG
    from sift_tpu.ops import pyramid as pyr
    from sift_tpu.ops import extrema as ext
    from sift_tpu.ops import match as match_mod

    import cv2
    big = cv2.imread("/root/reference/data/scene.jpg")
    f0 = jnp.asarray(cv2.cvtColor(cv2.resize(big, (1920, 1080)),
                                  cv2.COLOR_RGB2GRAY).astype(np.float32))

    @jax.jit
    def pyrdog(acc):
        octs = pyr.build_gaussian_pyramid(f0 + acc * 1e-9, CFG)
        dogs = pyr.build_dog_pyramid(octs)
        return dogs[4][0, 0, 0] * 1e-9 + acc

    @jax.jit
    def cand(acc):
        octs = pyr.build_gaussian_pyramid(f0 + acc * 1e-9, CFG)
        dogs = pyr.build_dog_pyramid(octs)
        s = acc
        for o in range(CFG.n_octaves):
            lay, r, c, v = ext.top_candidates(dogs[o],
                                              CFG.detect_caps[o], CFG)
            s = s + jnp.sum(r[:2]) * 1e-9
        return s

    def det(acc):
        kp, octs = sift.detect(f0 + acc * 1e-9, CFG)
        return kp.x[0] * 1e-9 + acc

    def full(acc):
        kp, d = sift.detect_and_compute(f0 + acc * 1e-9, CFG)
        return jnp.sum(d[:4]) + acc

    kp0, d0 = sift.detect_and_compute(f0, CFG)
    kp0 = jax.block_until_ready(kp0)

    def match_only(acc):
        m = match_mod.match_ratio(d0 + acc * 1e-9, d0,
                                  q_valid=kp0.valid, t_valid=kp0.valid)
        return jnp.sum(m.distance[:2]) * 1e-9 + acc

    stages = {
        "pyramid_dog_ms": _chain_ms(pyrdog),
        "pyramid_extrema_topk_ms": _chain_ms(cand),
        "detect_ms": _chain_ms(det),
        "detect_describe_ms": _chain_ms(full),
        "match_ms": _chain_ms(match_only),
    }
    out = {"image": "scene.jpg@1920x1080",
           "backend": jax.default_backend(),
           "stages": {k: round(v, 2) for k, v in stages.items()}}
    with open("BENCH_STAGES.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


def bench_internals() -> None:
    """Sub-stage breakdown of detect at 1080p -> BENCH_INTERNALS.json.

    Successive chained timings with one more pipeline piece each; the
    differences attribute cost to refine's dense derivative fields vs
    its gathers/Newton, and orientation's patch gather vs histogram —
    the data the <=10 ms detect roadmap needs.
    """
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from sift_tpu import sift
    from sift_tpu.config import DEFAULT_CONFIG as CFG
    from sift_tpu.ops import pyramid as pyr
    from sift_tpu.ops import extrema as ext
    from sift_tpu.ops import refine as ref
    from sift_tpu.ops import orientation as ori

    import cv2
    big = cv2.imread("/root/reference/data/scene.jpg")
    f0 = jnp.asarray(cv2.cvtColor(cv2.resize(big, (1920, 1080)),
                                  cv2.COLOR_RGB2GRAY).astype(np.float32))

    def upto(stage):
        """One jitted fn running the pipeline up to `stage`."""
        @jax.jit
        def fn(acc):
            octs = pyr.build_gaussian_pyramid(f0 + acc * 1e-9, CFG)
            dogs = pyr.build_dog_pyramid(octs)
            s = acc + dogs[4][0, 0, 0] * 1e-9
            if stage == "pyramid":
                return s
            for o in range(CFG.n_octaves):
                lay, r, c, v = ext.top_candidates(
                    dogs[o], CFG.detect_caps[o], CFG)
                s = s + jnp.sum(r[:2]).astype(jnp.float32) * 1e-9
                if stage == "cand":
                    continue
                if stage == "fields":
                    flds = ref.derivative_fields(dogs[o])
                    s = s + flds[0][0] * 1e-9
                    continue
                rf = ref.refine_candidates(dogs[o], lay, r, c, v, CFG)
                s = s + jnp.sum(rf.xr[:2]) * 1e-9
                if stage == "refine":
                    continue
                nl = CFG.n_octave_layers
                scl = CFG.sigma * jnp.exp2(
                    (rf.layer.astype(jnp.float32) + rf.xi) / nl)
                if stage == "ori_gather":
                    # the patch gather alone: vmapped dynamic_slice
                    rp = CFG.ori_patch_radius
                    padded = jnp.pad(octs[o],
                                     ((0, 0), (rp + 1, rp + 1),
                                      (rp + 1, rp + 1)))

                    def g(l0, r0, c0):
                        p = jax.lax.dynamic_slice(
                            padded, (l0, r0, c0),
                            (1, 2 * rp + 3, 2 * rp + 3))
                        return jnp.sum(p) * 1e-9
                    s = s + jnp.sum(jax.vmap(g)(rf.layer, rf.r, rf.c))
                    continue
                ang, ok = ori.orientation_peaks(
                    octs[o], rf.layer, rf.r, rf.c, scl, rf.valid, CFG)
                s = s + jnp.sum(ang[:2, 0]) * 1e-9
            return s
        return fn

    stages = ["pyramid", "cand", "fields", "refine", "ori_gather",
              "ori"]
    t = {st: _chain_ms(upto(st)) for st in stages}

    def det(acc):
        kp, octs = sift.detect(f0 + acc * 1e-9, CFG)
        return kp.x[0] * 1e-9 + acc

    t["detect_full"] = _chain_ms(det)
    # Each prefix program is compiled standalone, so a sub-stage's
    # delta is its NON-OVERLAPPED cost; the full detect graph lets XLA
    # overlap the orientation gather with other work, which is why
    # detect_full < the "ori" prefix. Report that gap as a positive
    # overlap-savings line instead of the old negative "tail_glue"
    # (VERDICT r4 weak #4: the -7.22 line made the table unreadable).
    out = {"backend": jax.default_backend(),
           "cumulative_prefix_ms": {k: round(v, 2) for k, v in t.items()},
           "standalone_stage_ms": {
               "candidates": round(t["cand"] - t["pyramid"], 2),
               "refine_fields_only": round(t["fields"] - t["cand"], 2),
               "refine_total": round(t["refine"] - t["cand"], 2),
               "ori_patch_gather": round(
                   t["ori_gather"] - t["refine"], 2),
               "orientation_total": round(t["ori"] - t["refine"], 2),
           },
           "full_graph_overlap_savings_ms": round(
               t["ori"] - t["detect_full"], 2),
           "note": ("standalone_stage_ms = prefix-compiled, "
                    "non-overlapped cost of each detect sub-stage; in "
                    "the single full-detect graph XLA overlaps the "
                    "orientation patch gather with refine/histogram "
                    "work, recovering full_graph_overlap_savings_ms — "
                    "so standalone stages sum to MORE than "
                    "detect_full.")}
    with open("BENCH_INTERNALS.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


def _config_ab(field: str, values, stage: str, artifact: str) -> None:
    """Time a pipeline stage at 1080p under each value of one
    SIFTConfig field; write the timings to `artifact`."""
    _enable_compile_cache()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from sift_tpu import sift
    from sift_tpu.config import DEFAULT_CONFIG

    import cv2
    big = cv2.imread("/root/reference/data/scene.jpg")
    f0 = jnp.asarray(cv2.cvtColor(cv2.resize(big, (1920, 1080)),
                                  cv2.COLOR_RGB2GRAY).astype(np.float32))

    out = {"backend": jax.default_backend(), "field": field,
           f"{stage}_ms": {}}
    for v in values:
        cfg = dataclasses.replace(DEFAULT_CONFIG, **{field: v})

        if stage == "detect":
            def fn(acc, cfg=cfg):
                kp, octs = sift.detect(f0 + acc * 1e-9, cfg)
                return kp.x[0] * 1e-9 + acc
        else:
            def fn(acc, cfg=cfg):
                kp, desc = sift.detect_and_compute(f0 + acc * 1e-9, cfg)
                return jnp.sum(desc[:4]) + acc

        out[f"{stage}_ms"][str(v)] = round(_chain_ms(fn), 2)
        # flush after every arm: if a later arm crashes the device
        # (or the tunnel drops mid-A/B), the arms already measured
        # still land in the artifact
        with open(artifact, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


def bench_ori_ab() -> None:
    """On-chip A/B of the orientation histogram formulation (VERDICT
    r3 item 7): detect at 1080p under each impl. Loser gets deleted."""
    _config_ab("ori_hist_impl", ("onehot", "onehot_t", "factored"),
               "detect", "ORI_AB.json")


def bench_ori_gather_ab() -> None:
    """On-chip A/B of the orientation patch gather: vmapped
    dynamic_slice (serialized per-keypoint gathers) vs the Pallas
    batched-DMA kernel (ops/ori_gather_pallas.py). Detect at 1080p."""
    _config_ab("ori_gather_impl", ("dynamic_slice", "pallas"),
               "detect", "ORI_GATHER_AB.json")


def bench_descr_ab() -> None:
    """On-chip A/B of the descriptor one-hot layout: detect+describe
    at 1080p under pk (bins on lanes) vs kp (samples on lanes)."""
    _config_ab("descr_layout", ("pk", "kp"),
               "detect_describe", "DESCR_AB.json")


def bench_descr_gather_ab() -> None:
    """On-chip A/B of the descriptor patch gather (dynamic_slice vs
    Pallas batched DMA): detect+describe at 1080p."""
    _config_ab("descr_gather_impl", ("dynamic_slice", "pallas"),
               "detect_describe", "DESCR_GATHER_AB.json")


def bench_band() -> None:
    """Band-shaped blur timings for the spatial-tiling projection
    (VERDICT r3 item 4): the tiled path's per-device unit of work is a
    haloed row band of a 4K frame. Times the fused Pallas kernel vs
    the XLA conv twin on such bands; writes BENCH_BAND.json. The
    multi-chip projection is band_ms + one ppermute halo exchange
    (~2*halo*W*4 bytes over ICI) per octave."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from sift_tpu.config import DEFAULT_CONFIG as CFG
    from sift_tpu.ops.conv import gaussian_blur_multi
    from sift_tpu.ops.conv_pallas import gaussian_blur_multi_pallas

    halo = 64
    sig = CFG.scale_sigmas()[1:]
    rng = np.random.default_rng(0)

    out = {"backend": jax.default_backend(), "halo": halo, "bands": {}}
    # a 4-device and an 8-device split of a 2160-row 4K frame
    for n_dev, h4k, w4k in ((4, 2160, 3840), (8, 2160, 3840)):
        hb = -(-h4k // n_dev) + 2 * halo
        x = jnp.asarray(rng.random((hb, w4k), np.float32) * 255)

        @jax.jit
        def pal(img):
            return jnp.sum(gaussian_blur_multi_pallas(img, sig)[:, 0, :2]) * 1e-9

        @jax.jit
        def xla(img):
            return jnp.sum(gaussian_blur_multi(img, sig)[:, 0, :2]) * 1e-9

        out["bands"][f"{n_dev}dev_{hb}x{w4k}"] = {
            "pallas_ms": round(_chain_ms(
                lambda acc, f=pal, xx=x: f(xx + acc * 1e-9)), 3),
            "xla_ms": round(_chain_ms(
                lambda acc, f=xla, xx=x: f(xx + acc * 1e-9)), 3),
        }
    with open("BENCH_BAND.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


def _measure_frames_per_s(batch: int, size) -> float:
    """frames/s for one (B, resolution) operating point on one chip.

    B == 1 is the LATENCY path: one frame pair via detect_and_compute
    + one match per two frames (exactly the headline's step).
    B > 1 is the THROUGHPUT path: detect_and_compute_batch + vmapped
    consecutive-frame matching ((B-1)/B matches per frame — matching
    is ~2 ms of an ~18 ms frame, so the per-frame work skew between
    the two modes is small and favors neither decisively).
    """
    import jax
    import jax.numpy as jnp
    from sift_tpu import sift
    from sift_tpu.config import DEFAULT_CONFIG as CFG
    from sift_tpu.ops import match as match_mod

    import cv2
    w, h = size
    big = cv2.imread("/root/reference/data/scene.jpg")
    frames = []
    for i in range(max(batch, 2)):
        crop = big[:, (17 * i) % 128:]
        frames.append(cv2.cvtColor(cv2.resize(crop, (w, h)),
                                   cv2.COLOR_RGB2GRAY).astype(np.float32))

    if batch == 1:
        f0, f1 = jnp.asarray(frames[0]), jnp.asarray(frames[1])

        def step(acc):
            kp0, d0 = sift.detect_and_compute(f0 + acc * 1e-9, CFG)
            kp1, d1 = sift.detect_and_compute(f1 + acc * 1e-9, CFG)
            m = match_mod.match_ratio(d1, d0, q_valid=kp1.valid,
                                      t_valid=kp0.valid,
                                      ratio=CFG.match_ratio)
            return jnp.sum(m.distance * m.good) + jnp.sum(kp0.x[:8])
        frames_per_step = 2.0
    else:
        fb = jnp.asarray(np.stack(frames))

        def step(acc):
            kp, d = sift.detect_and_compute_batch(fb + acc * 1e-9, CFG)

            def m(di, vi, dj, vj):
                r = match_mod.match_ratio(di, dj, q_valid=vi, t_valid=vj,
                                          ratio=CFG.match_ratio)
                return jnp.sum(r.distance * r.good)
            ms = jax.vmap(m)(d[1:], kp.valid[1:], d[:-1], kp.valid[:-1])
            return jnp.sum(ms) + jnp.sum(kp.x[:, :4])
        frames_per_step = float(batch)

    def run_chain(k: int, seed: float) -> float:
        t0 = time.perf_counter()
        acc = jnp.float32(seed)
        for _ in range(k):
            acc = step(acc)
        float(np.asarray(acc))
        return time.perf_counter() - t0

    run_chain(1, 0.5)
    t1 = min(run_chain(1, 0.7 + i * 0.01) for i in range(3))
    k = 6
    tk = min(run_chain(k, 0.9 + i * 0.01) for i in range(2))
    sec_per_step = max((tk - t1) / (k - 1), 1e-9)
    return frames_per_step / sec_per_step


def bench_batch(batch: int) -> None:
    """Single throughput point at 1080p -> BENCH_BATCH.json (see
    bench_batch_sweep for the full operating-point matrix)."""
    _enable_compile_cache()
    import jax
    frames_per_s = _measure_frames_per_s(batch, (1920, 1080))
    ref_fps = 1.0 / REF_SECONDS_PER_FRAME_1080P
    result = {
        "metric": f"detect_describe_match_1080p_batch{batch}",
        "value": round(frames_per_s, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_s / ref_fps, 2),
    }
    out = dict(result)
    out["backend"] = jax.default_backend()
    with open("BENCH_BATCH.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(result))


def bench_batch_sweep() -> None:
    """B x resolution operating-point matrix (VERDICT r4 #4): does the
    batched path EVER beat per-frame latency dispatch on one chip?

    Measures frames/s at B in {1, 4, 8} x {480p, 720p, 1080p} with the
    same chained-step methodology everywhere (B=1 = the latency path
    the headline uses) and writes the matrix + per-resolution verdict
    to BENCH_BATCH.json. parallel/frames.py consults the committed
    verdict to pick its per-chip mode.

    Caveat: detect caps (config.detect_caps) are sized for 1080p, so
    small resolutions carry padding slack in BOTH modes equally; the
    crossover comparison is mode-vs-mode at fixed config.
    """
    _enable_compile_cache()
    import jax
    sizes = {"480p": (854, 480), "720p": (1280, 720),
             "1080p": (1920, 1080)}
    out = {"backend": jax.default_backend(), "matrix": {},
           "batch_wins": {}}
    for name, size in sizes.items():
        row = {}
        for b in (1, 4, 8):
            row[f"B{b}"] = round(_measure_frames_per_s(b, size), 2)
            out["matrix"][name] = row
            # flush per point: a mid-sweep crash keeps earlier points
            with open("BENCH_BATCH.json", "w") as f:
                json.dump(out, f, indent=2)
        best_b = max(row, key=row.get)
        out["batch_wins"][name] = best_b != "B1"
        out.setdefault("best_mode", {})[name] = best_b
    ref_fps = 1.0 / REF_SECONDS_PER_FRAME_1080P
    v1080 = out["matrix"]["1080p"]
    out["metric"] = "detect_describe_match_1080p_batch8"
    out["value"] = v1080["B8"]
    out["unit"] = "frames/s/chip"
    out["vs_baseline"] = round(v1080["B8"] / ref_fps, 2)
    with open("BENCH_BATCH.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


def main() -> None:
    modes = ("--stages", "--batch", "--batch-sweep", "--internals",
             "--ori-ab", "--ori-gather-ab", "--descr-ab",
             "--descr-gather-ab", "--band")
    if "--no-preflight" not in sys.argv:
        preflight(headline=not any(m in sys.argv for m in modes))
    if "--stages" in sys.argv:
        bench_stages()
        return
    if "--batch-sweep" in sys.argv:
        bench_batch_sweep()
        return
    if "--batch" in sys.argv:
        bench_batch(int(sys.argv[sys.argv.index("--batch") + 1]))
        return
    if "--internals" in sys.argv:
        bench_internals()
        return
    if "--ori-ab" in sys.argv:
        bench_ori_ab()
        return
    if "--ori-gather-ab" in sys.argv:
        bench_ori_gather_ab()
        return
    if "--descr-ab" in sys.argv:
        bench_descr_ab()
        return
    if "--descr-gather-ab" in sys.argv:
        bench_descr_gather_ab()
        return
    if "--band" in sys.argv:
        bench_band()
        return
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from sift_tpu import sift
    from sift_tpu.config import DEFAULT_CONFIG as CFG
    from sift_tpu.ops import match as match_mod

    # 1080p frame pair from the reference corpus (scene.jpg is
    # 2048x1280); fall back to synthetic if decoding is unavailable.
    try:
        import cv2
        big = cv2.imread("/root/reference/data/scene.jpg")
        f0 = cv2.cvtColor(cv2.resize(big, (1920, 1080)),
                          cv2.COLOR_RGB2GRAY).astype(np.float32)
        f1 = cv2.cvtColor(cv2.resize(big[:, 200:], (1920, 1080)),
                          cv2.COLOR_RGB2GRAY).astype(np.float32)
    except Exception:
        rng = np.random.default_rng(0)
        f0 = (rng.random((1080, 1920)) * 255).astype(np.float32)
        f1 = np.roll(f0, 37, axis=1)

    f0 = jnp.asarray(f0)
    f1 = jnp.asarray(f1)

    def pair_step(a, b):
        """One full pipeline: extract both frames + match."""
        kp0, d0 = sift.detect_and_compute(a, CFG)
        kp1, d1 = sift.detect_and_compute(b, CFG)
        m = match_mod.match_ratio(d1, d0, q_valid=kp1.valid,
                                  t_valid=kp0.valid,
                                  ratio=CFG.match_ratio)
        return jnp.sum(m.distance * m.good) + jnp.sum(kp0.x[:8])

    def run_chain(k: int, seed: float) -> float:
        t0 = time.perf_counter()
        acc = jnp.float32(seed)
        for _ in range(k):
            # device-side dependence: next input perturbed by result
            acc = pair_step(f0 + acc * 1e-9, f1 + acc * 1e-9)
        float(np.asarray(acc))  # host pull forces the whole chain
        return time.perf_counter() - t0

    run_chain(1, 0.5)  # warm up compile for both shapes + matcher
    t1 = min(run_chain(1, 0.7 + i * 0.01) for i in range(3))
    k = 8
    tk = min(run_chain(k, 0.9 + i * 0.01) for i in range(3))
    sec_per_pair = max((tk - t1) / (k - 1), 1e-9)
    frames_per_s = 2.0 / sec_per_pair

    ref_fps = 1.0 / REF_SECONDS_PER_FRAME_1080P
    result = {
        "metric": "detect_describe_match_1080p",
        "value": round(frames_per_s, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_s / ref_fps, 2),
    }
    print(f"# backend={jax.default_backend()} "
          f"sec_per_pair={sec_per_pair:.4f} t1={t1:.3f} tk={tk:.3f}",
          file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
