"""Pack reference-dump text files into tests/golden/ref_dump.npz.

Input layout (produced by build.sh + dump_main.cpp):
    <dumpdir>/<pair>/kp_{scene,object}.txt     x y size angle octave resp
    <dumpdir>/<pair>/desc_{scene,object}.f32   raw float32 N x 128
    <dumpdir>/<pair>/matches.txt               qi ti d1 d2 good

The packed npz is the golden data for the >=0.95 recall acceptance
gate (BASELINE.json; reference correspondences from its own demo
semantics, src/main.cpp:19-54).
"""

import json
import os
import sys

import numpy as np

PAIRS = {
    # pair tag -> (scene source, object source, scene_resized)
    # sources named <stem>_<W>x<H> are <stem>.jpg pre-resized to WxH;
    # <stem>_960 is the square-960 shorthand (see eval._golden_gray)
    "book": ("scene.jpg", "book.jpg", True),
    "query": ("base.jpg", "query.png", True),
    "adidas": ("adidas.jpg", "query2.png", True),
    "rotate": ("query_960", "rotate_960", False),
    "viewpoint": ("query_960", "2ndviewpoint_960", False),
    # the headline benchmark configuration: scene at 1920x1080
    "book1080": ("scene_1920x1080", "book.jpg", False),
    # high-match-count pairs (match-recall gate statistical teeth)
    "rotate1080": ("query_1920x1080", "rotate_1920x1080", False),
    "viewpoint1080": ("query_1920x1080", "2ndviewpoint_1920x1080",
                      False),
    "selfscale": ("scene.jpg", "scene_1920x1080", False),
}


def main(dumpdir: str, out: str) -> None:
    arrays = {}
    meta = {}
    for tag, (scene, obj, resized) in PAIRS.items():
        d = os.path.join(dumpdir, tag)
        if not os.path.isdir(d):
            print(f"skip {tag}: no dump dir")
            continue
        for role in ("scene", "object"):
            kp = np.loadtxt(os.path.join(d, f"kp_{role}.txt"),
                            dtype=np.float32, ndmin=2)
            shape = open(os.path.join(d, f"desc_{role}.shape")).read().split()
            n, dim = int(shape[0]), int(shape[1])
            desc = np.fromfile(os.path.join(d, f"desc_{role}.f32"),
                               dtype=np.float32).reshape(n, dim)
            assert len(kp) == n, (tag, role, len(kp), n)
            arrays[f"{tag}_kp_{role}"] = kp
            arrays[f"{tag}_desc_{role}"] = desc.astype(np.float16)
        m = np.loadtxt(os.path.join(d, "matches.txt"),
                       dtype=np.float32, ndmin=2)
        arrays[f"{tag}_matches"] = m
        meta[tag] = {"scene": scene, "object": obj,
                     "scene_resized": resized,
                     "n_scene": int(arrays[f"{tag}_kp_scene"].shape[0]),
                     "n_object": int(arrays[f"{tag}_kp_object"].shape[0]),
                     "n_good": int(m[:, 4].sum()) if len(m) else 0}
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **arrays,
                        meta=np.frombuffer(
                            json.dumps(meta).encode(), dtype=np.uint8))
    print(json.dumps(meta, indent=2))
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.2f} MB)")


if __name__ == "__main__":
    dumpdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refdump"
    out = (sys.argv[2] if len(sys.argv) > 2 else
           os.path.join(os.path.dirname(__file__), "..", "..",
                        "tests", "golden", "ref_dump.npz"))
    main(dumpdir, out)
