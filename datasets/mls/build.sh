#!/usr/bin/env bash
# Build the MLS-KWS datasets for all six languages
# (reference: datasets/mls/build.sh).
# Usage: build.sh <MLS_TARBALL_DIR> <OUT_ROOT> <WHISPER_CKPT_DIR>
set -euo pipefail
CORPUS=$1; OUT=$2; WHISPER=$3
HERE=$(dirname "$0"); REPO=$HERE/../..

for LANG in english german french spanish polish portuguese; do
  BASE="$OUT/mls_${LANG}_opus/train"
  mkdir -p "$BASE"
  [ -e "$CORPUS/mls_${LANG}_opus.tar.gz" ] && tar -xzf "$CORPUS/mls_${LANG}_opus.tar.gz" -C "$OUT"
  cp "$HERE/$LANG"/keywords.txt "$HERE/$LANG"/positives.tsv "$BASE/" 2>/dev/null || true
  mkdir -p "$BASE/hs"
  python "$REPO/utils.py" --extract_hs -a "$BASE/audio" -w "$WHISPER" -t "$BASE/hs" -u "$BASE/positives.tsv"
  mkdir -p "$BASE/keywords-audios/natural" "$BASE/keywords-hs/natural"
  python "$REPO/utils.py" --cut_audios -a "$BASE/audio" -k "$HERE/$LANG/aligned.tsv" -t "$BASE/keywords-audios/natural"
  python "$REPO/utils.py" --extract_hs -a "$BASE/keywords-audios/natural" -w "$WHISPER" -t "$BASE/keywords-hs/natural"
done
echo "mls build complete: $OUT"
