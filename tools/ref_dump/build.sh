#!/usr/bin/env bash
# Build the reference SIFT (canhld94/SIFT-GPU) out-of-tree against the
# system OpenCV 4.6 and produce `refdump`, which dumps keypoints /
# descriptors / matches for the recall acceptance gate (eval.py).
#
# The reference sources are copied to a scratch dir (never into the
# repo) and compiled as-is; API drift between its OpenCV-4.0-era code
# and 4.6 is absorbed by shim headers only (empty cuda.h, a
# xfeatures2d.hpp forwarding to features2d where cv::SIFT now lives).
set -euo pipefail
REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
HERE=$(cd "$(dirname "$0")" && pwd)

mkdir -p "$BUILD/shim/opencv2"
cp "$REF/src/sift.cpp" "$BUILD/"
cp "$REF/include/sift.hpp" "$BUILD/"

cat > "$BUILD/shim/cuda.h" <<'EOF'
/* shim: the reference includes <cuda.h> but uses nothing from it
   (SURVEY.md scope note; reference include/sift.hpp:13). Piggyback
   the OpenCV 4.6 TLS header, which utility.hpp no longer pulls in
   (core.hpp first: tls.hpp needs cvdef prerequisites). */
#include <opencv2/core.hpp>
#include <opencv2/core/utils/tls.hpp>
/* 4.6 moved gather() to TLSDataAccumulator */
#define TLSData TLSDataAccumulator
EOF

cat > "$BUILD/shim/opencv2/xfeatures2d.hpp" <<'EOF'
/* shim: OpenCV >=4.4 moved SIFT from xfeatures2d to core features2d */
#include <opencv2/features2d.hpp>
namespace cv { namespace xfeatures2d { using cv::SIFT; } }
EOF

g++ -std=c++11 -O3 -fopenmp -Wno-deprecated-declarations \
    -I"$BUILD/shim" -I"$BUILD" $(pkg-config --cflags opencv4) \
    "$BUILD/sift.cpp" "$HERE/dump_main.cpp" \
    -o "$BUILD/refdump" \
    -lopencv_core -lopencv_imgproc -lopencv_imgcodecs \
    -lopencv_features2d -lopencv_calib3d -lopencv_highgui
echo "built $BUILD/refdump"
