#!/usr/bin/env bash
# Build the ACL-6060 terminology dataset (reference: datasets/acl/build.sh).
# Usage: build.sh <ACL_TARBALL> <OUT_ROOT> <WHISPER_CKPT_DIR>
set -euo pipefail
CORPUS=$1; OUT=$2; WHISPER=$3
HERE=$(dirname "$0"); REPO=$HERE/../..

mkdir -p "$OUT"
tar -xzf "$CORPUS" -C "$OUT"
for SPLIT in dev eval; do
  BASE="$OUT/2/acl_6060/$SPLIT"
  mkdir -p "$BASE/hs" "$BASE/keywords-audios/natural" "$BASE/keywords-hs/natural"
  python "$REPO/utils.py" --extract_hs -a "$BASE/segmented_wavs/gold" -w "$WHISPER" -t "$BASE/hs"
  python "$REPO/utils.py" --cut_audios -a "$BASE/segmented_wavs/gold" -k "$HERE/$SPLIT-aligned.tsv" -t "$BASE/keywords-audios/natural"
  python "$REPO/utils.py" --extract_hs -a "$BASE/keywords-audios/natural" -w "$WHISPER" -t "$BASE/keywords-hs/natural"
done
echo "acl build complete: $OUT"
