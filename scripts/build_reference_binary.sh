#!/bin/bash
# Build the actual reference binary (for differential fuzzing only; the
# framework never links or ships this). The vendored zlib-ng submodule is
# empty in this snapshot; system zlib is API-compatible with the zlib
# engine in libs/refresh/compression, so a header shim suffices.
set -e
rm -rf /tmp/refbuild && cp -r /root/reference /tmp/refbuild
mkdir -p /tmp/refbuild/shim/zlib-ng
cp /usr/include/zlib.h /tmp/refbuild/shim/zlib-ng/zlib.h
cp /usr/include/zconf.h /tmp/refbuild/shim/
cd /tmp/refbuild
g++ -O3 -std=c++20 -march=native -DNDEBUG -DARCH_X64 \
    -I libs -I shim src/*.cpp -o /tmp/lzani_ref -lz -lpthread
/tmp/lzani_ref 2>&1 | head -1
