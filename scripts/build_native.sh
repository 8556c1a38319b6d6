#!/bin/sh
# Build the native host-side components (csrc/). Safe to skip: everything
# has a pure-Python fallback.
set -e
cd "$(dirname "$0")/../csrc"
make
echo "built: audiogan_tpu/data/_libagwav.so"
