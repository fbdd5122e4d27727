#!/bin/bash
# Build the reference FAMSA 2.5.0 (at /root/reference, read-only) into
# /tmp/refbuild/bin/famsa for live baseline measurement by bench.py.
#
# The reference's git submodules (mimalloc, libdeflate, zlib-ng, isa-l;
# .gitmodules:1-13) are absent from the snapshot, so this script builds
# against system zlib and a small libdeflate shim (gzip output via zlib's
# deflate with windowBits=31). mimalloc is simply not linked (it is an
# allocator override only, makefile:18,82-88).
set -euo pipefail

REF=/root/reference
OUT=/tmp/refbuild
SRC=$OUT/src
mkdir -p $OUT/bin $OUT/obj $OUT/shim/libdeflate

cp -r $REF/src $OUT/
cp -r $REF/libs/refresh $OUT/libs_refresh
# sources include "../libs/refresh/..." relative to src/
mkdir -p $OUT/libs
ln -sfn $OUT/libs_refresh $OUT/libs/refresh

# --- libdeflate shim (only the 4 symbols io_service.cpp:131-208 uses) ---
cat > $OUT/shim/libdeflate/libdeflate.h <<'EOF'
#pragma once
#include <stddef.h>
#ifdef __cplusplus
extern "C" {
#endif
typedef struct libdeflate_compressor libdeflate_compressor;
libdeflate_compressor* libdeflate_alloc_compressor(int level);
size_t libdeflate_gzip_compress_bound(libdeflate_compressor*, size_t n);
size_t libdeflate_gzip_compress(libdeflate_compressor*, const void* in,
                                size_t in_n, void* out, size_t out_n);
void libdeflate_free_compressor(libdeflate_compressor*);
#ifdef __cplusplus
}
#endif
EOF
cat > $OUT/shim/libdeflate_shim.cpp <<'EOF'
#include <zlib.h>
#include <cstdlib>
#include <cstring>
extern "C" {
struct libdeflate_compressor { int level; };
libdeflate_compressor* libdeflate_alloc_compressor(int level) {
    auto* c = new libdeflate_compressor; c->level = level > 9 ? 9 : level; return c;
}
size_t libdeflate_gzip_compress_bound(libdeflate_compressor*, size_t n) {
    return compressBound(n) + 32;
}
size_t libdeflate_gzip_compress(libdeflate_compressor* c, const void* in,
                                size_t in_n, void* out, size_t out_n) {
    z_stream s; memset(&s, 0, sizeof(s));
    if (deflateInit2(&s, c->level, Z_DEFLATED, 31, 9, Z_DEFAULT_STRATEGY) != Z_OK)
        return 0;
    s.next_in = (Bytef*)in; s.avail_in = (uInt)in_n;
    s.next_out = (Bytef*)out; s.avail_out = (uInt)out_n;
    int r = deflate(&s, Z_FINISH);
    size_t produced = (r == Z_STREAM_END) ? s.total_out : 0;
    deflateEnd(&s);
    return produced;
}
void libdeflate_free_compressor(libdeflate_compressor* c) { delete c; }
}
EOF

CXX=${CXX:-g++}
COMMON="-O3 -std=c++20 -m64 -DARCH_X64 -DSIMD_AVX2 -DREFRESH_USE_ZLIB -DNDEBUG \
 -I$OUT/libs_refresh/.. -I$OUT/shim -I$SRC -fno-omit-frame-pointer -pthread"
# refresh lib is included as <refresh/...>: create that prefix
mkdir -p $OUT/inc
ln -sfn $OUT/libs_refresh $OUT/inc/refresh
COMMON="$COMMON -I$OUT/inc"

objs=()
build() { # file, extra flags
    local f=$1; shift
    local o=$OUT/obj/$(echo "$f" | sed "s#$OUT/##; s#/#_#g").o
    if [ ! -f "$o" ] || [ "$f" -nt "$o" ]; then
        $CXX $COMMON "$@" -c "$f" -o "$o" &
    fi
    objs+=("$o")
}

for f in $SRC/*.cpp $SRC/core/*.cpp $SRC/lcs/*.cpp $SRC/tree/*.cpp $SRC/utils/*.cpp; do
    build "$f"
done
build $SRC/simd/lcsbp_avx_intr.cpp -mavx
build $SRC/simd/utils_avx.cpp -mavx
build $SRC/simd/lcsbp_avx2_intr.cpp -mavx2
build $SRC/simd/utils_avx2.cpp -mavx2
build $SRC/simd/lcsbp_avx512_intr.cpp -mavx512f -mavx512dq -mavx512bw
build $OUT/shim/libdeflate_shim.cpp
wait

$CXX -o $OUT/bin/famsa "${objs[@]}" -lz -pthread
echo "built $OUT/bin/famsa"
$OUT/bin/famsa 2>&1 | head -3 || true
