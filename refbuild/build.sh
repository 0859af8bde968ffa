#!/bin/sh
# Build the actual reference FEM binary (/root/reference/src, unmodified)
# against the minimal htslib text-SAM stub in htslib_stub/ (the real
# htslib submodule is not vendored). Produces refbuild/FEM.
set -e
here="$(cd "$(dirname "$0")" && pwd)"
ref="${FEM_REFERENCE_DIR:-/root/reference}"
out="$here/FEM"
objs="$here/objs"
mkdir -p "$objs"
CFLAGS="-Wall -O3 -march=native -I$here/htslib_stub/include -I$ref/src"
srcs="sequence_batch.c index.c filter.c align.c input_queue.c output_queue.c map.c FEM_map.c FEM_index.c FEM.c kstring.c"
newer=0
for s in $srcs; do
    o="$objs/${s%.c}.o"
    if [ ! -f "$o" ] || [ "$ref/src/$s" -nt "$o" ]; then
        gcc $CFLAGS -c "$ref/src/$s" -o "$o"
        newer=1
    fi
done
o="$objs/sam_stub.o"
if [ ! -f "$o" ] || [ "$here/htslib_stub/sam_stub.c" -nt "$o" ] || \
   [ "$here/htslib_stub/include/htslib/sam.h" -nt "$o" ]; then
    gcc $CFLAGS -c "$here/htslib_stub/sam_stub.c" -o "$o"
    newer=1
fi
if [ ! -x "$out" ] || [ "$newer" = 1 ]; then
    gcc $CFLAGS "$objs"/*.o -o "$out" -lpthread -lm -lz
fi
echo "$out"
