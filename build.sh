#!/usr/bin/env bash
# Build everything that has a native component (the framework equivalent of
# the reference's cmake_build.sh:28-34): the block-IO runtime library via
# CMake+Ninja, then a quick import check of the Python package.
set -euo pipefail
cd "$(dirname "$0")"

NATIVE_DIR=demodulator_tpu/runtime/native
BUILD_DIR="$NATIVE_DIR/build"

cmake -G Ninja -DCMAKE_BUILD_TYPE=Release ${IS_NATIVE:+-DIS_NATIVE=ON} \
      -B "$BUILD_DIR" -S "$NATIVE_DIR"
ninja -C "$BUILD_DIR"
cp "$BUILD_DIR/libblockio.so" "$NATIVE_DIR/libblockio.so"

python - <<'EOF'
from demodulator_tpu.runtime import native
assert native.available(), "native blockio failed to load"
print("native blockio: OK")
import demodulator_tpu.cli  # CLI imports cleanly
print("package: OK")
EOF
