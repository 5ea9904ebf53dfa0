#!/usr/bin/env bash
# Reproduce the reference's example-data evaluation (README.md:140-210 golden
# numbers: ASR_BLEU 15.448, AL 1724.9 ms, AP 0.425, ... on the 2-utterance
# example at 320 ms chunks) with this framework and the RELEASED checkpoints.
#
# Prerequisites (no network egress in the build environment — download these on
# a connected machine; see /root/reference/pretrain_models/README.md and the
# reference README's model table):
#   $MODELS/streamspeech.simultaneous.fr-en.pt
#   $MODELS/mHuBERT.layer11.km1000.en/g_00500000 + config.json
#   16 kHz wav versions of example/wavs/*.mp3 (this environment has no mp3
#   decoder; `ffmpeg -i x.mp3 -ar 16000 -ac 1 x.wav` elsewhere)
set -euo pipefail

MODELS=${MODELS:-/data/pretrain_models}
CONFIGS=${CONFIGS:-/root/reference/configs/fr-en}
EXAMPLE=${EXAMPLE:-example}   # wav_list.txt + target.txt with .wav files
OUT=${OUT:-res/example-simul-s2st}

# 1. convert the released checkpoint once (also writes config.json)
python scripts/convert_checkpoint.py import \
    --pt "$MODELS/streamspeech.simultaneous.fr-en.pt" --out ckpts/fr-en

# 2. simultaneous S2ST evaluation at 320 ms chunks
python -m streamspeech_tpu.cli.simuleval \
    --source "$EXAMPLE/wav_list.txt" --target "$EXAMPLE/target.txt" \
    --checkpoint ckpts/fr-en/checkpoint_0 --agent s2st \
    --source-segment-size 320 \
    --src-dict "$CONFIGS/src_unigram6000/spm_unigram_fr.txt" \
    --tgt-dict "$CONFIGS/tgt_unigram6000/spm_unigram_fr.txt" \
    --gcmvn "$CONFIGS/gcmvn.npz" \
    --vocoder "$MODELS/mHuBERT.layer11.km1000.en/g_00500000" \
    --vocoder-cfg "$MODELS/mHuBERT.layer11.km1000.en/config.json" \
    --output "$OUT"

# 3. offline S2ST with beam 10 (the "beam10" rows of BASELINE.md)
python -m streamspeech_tpu.cli.generate \
    --checkpoint ckpts/fr-en/checkpoint_0 \
    --manifest "$EXAMPLE/wav_list.txt" --beam 10 \
    --src-dict "$CONFIGS/src_unigram6000/spm_unigram_fr.txt" \
    --tgt-dict "$CONFIGS/tgt_unigram6000/spm_unigram_fr.txt" \
    --vocoder "$MODELS/mHuBERT.layer11.km1000.en/g_00500000" \
    --vocoder-cfg "$MODELS/mHuBERT.layer11.km1000.en/config.json" \
    --output "$OUT/offline"

echo "scores:"; cat "$OUT/scores.tsv"
