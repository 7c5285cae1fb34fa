#!/usr/bin/env bash
# One command reproduces tests/golden/ref_dump.npz from scratch:
# build the reference binary (build.sh), run it on every golden pair
# (incl. the pre-resized invariance probes and the 1080p headline
# configuration), and pack the dumps.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "$HERE/../.." && pwd)
REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
DUMP=${DUMP:-/tmp/refdump}

"$HERE/build.sh"

mkdir -p "$DUMP"
python - <<EOF
import cv2, os
os.chdir("$DUMP")
for name, size in [("query", (960, 960)), ("rotate", (960, 960)),
                   ("2ndviewpoint", (960, 960)),
                   ("query", (1920, 1080)), ("rotate", (1920, 1080)),
                   ("2ndviewpoint", (1920, 1080)),
                   ("scene", (1920, 1080))]:
    img = cv2.imread(f"$REF/data/{name}.jpg")
    tag = "960" if size == (960, 960) else "1920x1080"
    cv2.imwrite(f"{name}_{tag}.png", cv2.resize(img, size))
EOF

run() { mkdir -p "$DUMP/$1"; "$BUILD/refdump" "$2" "$3" "$DUMP/$1" "$4"; }
run book      "$REF/data/scene.jpg"       "$REF/data/book.jpg"   1
run query     "$REF/data/base.jpg"        "$REF/data/query.png"  1
run adidas    "$REF/data/adidas.jpg"      "$REF/data/query2.png" 1
run rotate    "$DUMP/query_960.png"       "$DUMP/rotate_960.png" 0
run viewpoint "$DUMP/query_960.png"       "$DUMP/2ndviewpoint_960.png" 0
run book1080  "$DUMP/scene_1920x1080.png" "$REF/data/book.jpg"   0
# high-match-count pairs: give the per-pair match-recall gate
# statistical teeth (the demo pairs top out at ~50 matches)
run rotate1080    "$DUMP/query_1920x1080.png" "$DUMP/rotate_1920x1080.png" 0
run viewpoint1080 "$DUMP/query_1920x1080.png" "$DUMP/2ndviewpoint_1920x1080.png" 0
run selfscale     "$REF/data/scene.jpg"       "$DUMP/scene_1920x1080.png" 0

python "$HERE/pack.py" "$DUMP" "$REPO/tests/golden/ref_dump.npz"
