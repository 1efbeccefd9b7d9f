#!/bin/bash
# Compile the reference implementation (read in place from /root/reference,
# never copied into this repo) together with the org.apache.datasketches
# shims and the parity harness. Output goes to a build dir outside the repo.
set -euo pipefail

REF=${SPARK_GRAFT_REFERENCE:-/root/reference}
SRC="$REF/core/src/main/java"
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD=${1:-/tmp/java_parity_build}

if [ ! -d "$SRC" ]; then
    echo "reference sources not found at $SRC" >&2
    exit 2
fi

mkdir -p "$BUILD/classes"
find "$SRC" -name '*.java' > "$BUILD/sources.txt"
find "$HERE/shims" -name '*.java' >> "$BUILD/sources.txt"
echo "$HERE/Harness.java" >> "$BUILD/sources.txt"

javac -nowarn -encoding UTF-8 -d "$BUILD/classes" @"$BUILD/sources.txt"
echo "compiled to $BUILD/classes"
