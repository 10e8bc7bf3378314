#!/usr/bin/env bash
# Build the aishell KWS (train) + hotword (dev/test) datasets
# (reference: datasets/aishell/build.sh).
#
# Vendored metadata consumed here:
#   train/: keywords.txt aligned.txt keywords_voice.txt  -> $OUT/kws/
#   dev/,test/: aligned.txt hotword_voice.txt            -> $OUT/hotword/<split>/
# positives.tsv (train utterance filter) and dev/test uttid come from the
# user's corpus / the SeACo-Paraformer repo, exactly as in the reference.
#
# Usage: build.sh <CORPUS_TARBALL_DIR> <OUT_ROOT> <WHISPER_CKPT_DIR>
set -euo pipefail
CORPUS=$1; OUT=$2; WHISPER=$3
HERE=$(cd "$(dirname "$0")" && pwd); REPO=$HERE/../..

mkdir -p "$OUT/wav"
for t in "$CORPUS"/*.tgz "$CORPUS"/*.tar.gz; do [ -e "$t" ] && tar -xzf "$t" -C "$OUT/wav"; done

# ---- kws (train) dataset
mkdir -p "$OUT/kws"
cp "$HERE"/train/* "$OUT/kws/"
mkdir -p "$OUT/kws/hs" \
         "$OUT/kws/keywords-audios/tts" "$OUT/kws/keywords-audios/natural" \
         "$OUT/kws/keywords-hs/tts" "$OUT/kws/keywords-hs/natural"

# ---- hotword (dev/test) dataset; transcripts/uttid cloned from
# SeACo-Paraformer on networked hosts (reference build.sh:46-59)
for SPLIT in dev test; do
  mkdir -p "$OUT/hotword/$SPLIT"
  cp "$HERE/$SPLIT"/* "$OUT/hotword/$SPLIT/"
  mkdir -p "$OUT/hotword/$SPLIT/hs" \
           "$OUT/hotword/$SPLIT/keywords-audios/tts" "$OUT/hotword/$SPLIT/keywords-audios/natural" \
           "$OUT/hotword/$SPLIT/keywords-hs/tts" "$OUT/hotword/$SPLIT/keywords-hs/natural"
done

# ---- utterance hidden states (the -u filters are user-corpus-supplied;
# extract everything when absent)
UFLAG=(); [ -f "$OUT/kws/positives.tsv" ] && UFLAG=(-u "$OUT/kws/positives.tsv")
python "$REPO/utils.py" --extract_hs -a "$OUT/wav/train" -w "$WHISPER" -t "$OUT/kws/hs" "${UFLAG[@]}"
for SPLIT in dev test; do
  UFLAG=(); [ -f "$OUT/hotword/$SPLIT/uttid" ] && UFLAG=(-u "$OUT/hotword/$SPLIT/uttid")
  python "$REPO/utils.py" --extract_hs -a "$OUT/wav/$SPLIT" -w "$WHISPER" -t "$OUT/hotword/$SPLIT/hs" "${UFLAG[@]}"
done

# ---- natural keyword audio + hidden states
python "$REPO/utils.py" --cut_audios -a "$OUT/wav/train" -k "$OUT/kws/aligned.txt" -t "$OUT/kws/keywords-audios/natural"
python "$REPO/utils.py" --extract_hs -a "$OUT/kws/keywords-audios/natural" -w "$WHISPER" -t "$OUT/kws/keywords-hs/natural"
for SPLIT in dev test; do
  python "$REPO/utils.py" --cut_audios -a "$OUT/wav/$SPLIT" -k "$OUT/hotword/$SPLIT/aligned.txt" -t "$OUT/hotword/$SPLIT/keywords-audios/natural"
  python "$REPO/utils.py" --extract_hs -a "$OUT/hotword/$SPLIT/keywords-audios/natural" -w "$WHISPER" -t "$OUT/hotword/$SPLIT/keywords-hs/natural"
done

# ---- tts keywords (networked hosts only):
#   python "$REPO/utils.py" --tts -k "$OUT/kws/keywords_voice.txt" -t "$OUT/kws/keywords-audios/tts" -l zh-CN
#   python "$REPO/utils.py" --extract_hs -a "$OUT/kws/keywords-audios/tts" -w "$WHISPER" -t "$OUT/kws/keywords-hs/tts"
#   (same per hotword split with hotword_voice.txt)
echo "aishell build complete: $OUT"
