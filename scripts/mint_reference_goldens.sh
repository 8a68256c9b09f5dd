#!/usr/bin/env bash
# Mint Movi-fork golden outputs for the checked-in toy config — run this in
# a NETWORKED environment (the reference fetches mumemto + the Movi fork at
# configure time, thirdparty/CMakeLists.txt:89-123; impossible offline).
#
# Produces tests/goldens/pattern.fa.split.pml.bin.ref and .cid.bin.ref:
# the byte-exact outputs of the shipped pipeline (movi-split query,
# scripts/col-bwt.py:194-198) on the same toy FASTAs the offline goldens
# pin.  Once these exist, pin io/pml_out.py's binary writer against them
# (SURVEY §2.4 hard part #1).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
GOLD="$REPO/tests/goldens"
WORK="${1:-$(mktemp -d)}"

git clone https://github.com/drnatebrown/col-bwt "$WORK/col-bwt"
cmake -S "$WORK/col-bwt" -B "$WORK/build" -DCMAKE_BUILD_TYPE=Release
cmake --build "$WORK/build" -j"$(nproc)"

cd "$WORK/build"
./col-bwt build -o "$WORK/index" -r -m tunnels -s 10 -l 20 \
    "$GOLD/seq1.fa" "$GOLD/seq2.fa"
./col-bwt query -p "$GOLD/pattern.fa" "$WORK/index"

cp "$GOLD/pattern.fa.split.pml.bin" "$GOLD/pattern.fa.split.pml.bin.ref"
cp "$GOLD/pattern.fa.split.cid.bin" "$GOLD/pattern.fa.split.cid.bin.ref"
echo "Reference goldens minted under $GOLD — now pin io/pml_out.py."
