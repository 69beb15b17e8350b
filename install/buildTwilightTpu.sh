#!/usr/bin/env bash
# Build/install twilight-tpu (reference analogue:
# install/buildTWILIGHT.sh, which cmake-builds the C++/CUDA binary).
# Here the Python package installs via pip and the native host modules
# (AVX2 DP kernel, host ops, stdorder) compile on demand via g++; this
# script does both eagerly and verifies the result.
#
# Usage: bash install/buildTwilightTpu.sh [tpu|cpu]
#   tpu (default): install jax with TPU support (TPU VM / libtpu)
#   cpu:           plain jax (host-only; --backend native needs no jax)
set -euo pipefail
BUILD_TYPE="${1:-tpu}"
SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)
REPO_DIR="${SCRIPT_DIR}/.."

command -v g++ >/dev/null || {
    echo "error: g++ is required (native kernels compile via g++)" >&2
    exit 1
}

if ! python3 -c "import jax" 2>/dev/null; then
    if [ "$BUILD_TYPE" = "tpu" ]; then
        pip install "jax[tpu]" \
            -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
            || pip install jax
    else
        pip install jax
    fi
fi

pip install "$REPO_DIR"

# compile the native modules now (first import runs g++)
python3 -c "
import twilight_tpu.native as n
from twilight_tpu.ops import talco_host
assert talco_host.available(), 'native host kernel failed to build'
print('native host kernel: OK')
"

echo "twilight-tpu installed; try: twilight-tpu --help"
