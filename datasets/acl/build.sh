#!/usr/bin/env bash
# Build the ACL-6060 terminology dataset (reference: datasets/acl/build.sh).
#
# Vendored metadata consumed here, per split:
#   {dev,eval}/{keywords.txt,aligned.tsv,keywords_voice.txt}
#   -> $OUT/2/acl_6060/<split>/text/
#
# Usage: build.sh <ACL_TARBALL> <OUT_ROOT> <WHISPER_CKPT_DIR>
set -euo pipefail
CORPUS=$1; OUT=$2; WHISPER=$3
HERE=$(cd "$(dirname "$0")" && pwd); REPO=$HERE/../..

mkdir -p "$OUT"
tar -xzf "$CORPUS" -C "$OUT"
for SPLIT in dev eval; do
  BASE="$OUT/2/acl_6060/$SPLIT"
  cp "$HERE/$SPLIT"/* "$BASE/text/"
  mkdir -p "$BASE/hs" \
           "$BASE/keywords-audios/tts" "$BASE/keywords-audios/natural" \
           "$BASE/keywords-hs/tts" "$BASE/keywords-hs/natural"

  python "$REPO/utils.py" --extract_hs -a "$BASE/segmented_wavs/gold" -w "$WHISPER" -t "$BASE/hs"
  python "$REPO/utils.py" --cut_audios -a "$BASE/segmented_wavs/gold" -k "$BASE/text/aligned.tsv" -t "$BASE/keywords-audios/natural"
  python "$REPO/utils.py" --extract_hs -a "$BASE/keywords-audios/natural" -w "$WHISPER" -t "$BASE/keywords-hs/natural"

  # tts keywords (networked hosts only):
  #   python "$REPO/utils.py" --tts -k "$BASE/text/keywords_voice.txt" -t "$BASE/keywords-audios/tts" -l en-US
  #   python "$REPO/utils.py" --extract_hs -a "$BASE/keywords-audios/tts" -w "$WHISPER" -t "$BASE/keywords-hs/tts"
done
echo "acl build complete: $OUT"
