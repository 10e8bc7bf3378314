#!/usr/bin/env bash
# Build the aishell KWS + hotword datasets (reference: datasets/aishell/build.sh).
# Stages: fetch/untar corpus -> copy repo metadata -> extract utterance
# hidden states -> cut natural keyword audio -> extract keyword hidden
# states (tts keywords require a networked host for edge-tts).
#
# Usage: build.sh <CORPUS_TARBALL_DIR> <OUT_ROOT> <WHISPER_CKPT_DIR>
set -euo pipefail
CORPUS=$1; OUT=$2; WHISPER=$3
HERE=$(dirname "$0"); REPO=$HERE/../..

mkdir -p "$OUT/kws" "$OUT/wav"
for t in "$CORPUS"/*.tgz "$CORPUS"/*.tar.gz; do [ -e "$t" ] && tar -xzf "$t" -C "$OUT/wav"; done
cp "$HERE"/keywords.txt "$HERE"/positives.tsv "$HERE"/aligned.tsv "$OUT/kws/" 2>/dev/null || true

mkdir -p "$OUT/kws/hs"
python "$REPO/utils.py" --extract_hs -a "$OUT/wav" -w "$WHISPER" -t "$OUT/kws/hs"

mkdir -p "$OUT/kws/keywords-audios/natural"
python "$REPO/utils.py" --cut_audios -a "$OUT/wav" -k "$OUT/kws/aligned.tsv" -t "$OUT/kws/keywords-audios/natural"
mkdir -p "$OUT/kws/keywords-hs/natural"
python "$REPO/utils.py" --extract_hs -a "$OUT/kws/keywords-audios/natural" -w "$WHISPER" -t "$OUT/kws/keywords-hs/natural"

# tts keywords (networked hosts only):
#   python "$REPO/utils.py" --tts -k "$OUT/kws/keywords.txt" -t "$OUT/kws/keywords-audios/tts" -l zh-CN
#   python "$REPO/utils.py" --extract_hs -a "$OUT/kws/keywords-audios/tts" -w "$WHISPER" -t "$OUT/kws/keywords-hs/tts"
echo "aishell build complete: $OUT"
