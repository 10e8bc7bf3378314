#!/usr/bin/env bash
# Build the MLS-KWS train datasets for all six languages
# (reference: datasets/mls/build.sh).
#
# Vendored metadata consumed here, per language:
#   train/mls_<lang>_opus/{uttid,keywords.txt,positives.tsv,aligned.tsv,keywords_voice.txt}
#   -> $OUT/mls_<lang>_opus/train/
#
# Usage: build.sh <MLS_TARBALL_DIR> <OUT_ROOT> <WHISPER_CKPT_DIR>
set -euo pipefail
CORPUS=$1; OUT=$2; WHISPER=$3
HERE=$(cd "$(dirname "$0")" && pwd); REPO=$HERE/../..

LANGS=(english german french spanish polish portuguese)
LOCALES=(en-US de-DE fr-FR es-ES pl-PL pt-PT)

for i in "${!LANGS[@]}"; do
  SUB="mls_${LANGS[$i]}_opus"
  BASE="$OUT/$SUB/train"
  [ -e "$CORPUS/$SUB.tar.gz" ] && tar -xzf "$CORPUS/$SUB.tar.gz" -C "$OUT"
  mkdir -p "$BASE"
  cp "$HERE/train/$SUB"/* "$BASE/"
  mkdir -p "$BASE/hs" \
           "$BASE/keywords-audios/tts" "$BASE/keywords-audios/natural" \
           "$BASE/keywords-hs/tts" "$BASE/keywords-hs/natural"

  python "$REPO/utils.py" --extract_hs -a "$BASE/audio" -w "$WHISPER" -t "$BASE/hs" -u "$BASE/uttid"
  python "$REPO/utils.py" --cut_audios -a "$BASE/audio" -k "$BASE/aligned.tsv" -t "$BASE/keywords-audios/natural"
  python "$REPO/utils.py" --extract_hs -a "$BASE/keywords-audios/natural" -w "$WHISPER" -t "$BASE/keywords-hs/natural"

  # tts keywords (networked hosts only):
  #   python "$REPO/utils.py" --tts -k "$BASE/keywords_voice.txt" -t "$BASE/keywords-audios/tts" -l "${LOCALES[$i]}"
  #   python "$REPO/utils.py" --extract_hs -a "$BASE/keywords-audios/tts" -w "$WHISPER" -t "$BASE/keywords-hs/tts"
done
echo "mls build complete: $OUT"
