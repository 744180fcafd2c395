#!/bin/sh
# Best-effort optimized build of libsvio.so, invoked by `make` (native_io
# auto-builds on import, so the library is always compiled ON the box that
# runs it — -march=native can never leak to a different microarchitecture).
#
# Ladder, each rung falling back to the next on ANY failure:
#   1. -march=native + PGO (compile the decoder into pgo_train, decode a
#      synthetic BAM to collect a gcov profile, rebuild with -fprofile-use;
#      ~13% on real window fetches vs rung 3 on the round-5 dev box)
#   2. -march=native only (~6%)
#   3. plain -O3 (the round-4 build)
set -u
cd "$(dirname "$0")"
CXX="${CXX:-g++}"
BASE="-O3 -fPIC -std=c++17 -Wall -pthread"
LDF="-shared -lz -pthread"
SRCS="svio.cc inflate.cc crc32.cc"

cleanup() { rm -f pgo_train pgo_train.tmp.bam ./*.gcda; }

ARCH=""
if echo 'int main(){return 0;}' | "$CXX" -march=native -x c++ - -o /dev/null \
    2>/dev/null; then
  ARCH="-march=native"
fi

cleanup
if "$CXX" $BASE $ARCH -fprofile-generate $SRCS pgo_train.cc -o pgo_train \
      -lz -pthread 2>/dev/null \
    && ./pgo_train pgo_train.tmp.bam >/dev/null 2>&1 \
    && "$CXX" $BASE $ARCH -fprofile-use -fprofile-correction $SRCS \
      -o libsvio.so $LDF 2>/dev/null; then
  cleanup
  exit 0
fi
cleanup

if [ -n "$ARCH" ] && "$CXX" $BASE $ARCH $SRCS -o libsvio.so $LDF 2>/dev/null
then
  exit 0
fi
exec "$CXX" $BASE $SRCS -o libsvio.so $LDF
