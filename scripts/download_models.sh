#!/usr/bin/env bash
# Fetch the base IndexTTS-1.5 checkpoints (reference scripts/download_models.sh).
# Files land in checkpoints/: gpt.pth, dvae.pth, bigvgan_generator.pth,
# bpe.model, config.yaml.  The .pth files are converted lazily at load time
# (indextts_tpu/io/checkpoint.py).
set -euo pipefail
DEST="${1:-checkpoints}"
REPO="${HF_REPO:-IndexTeam/IndexTTS-1.5}"
BASE="${HF_ENDPOINT:-https://huggingface.co}/${REPO}/resolve/main"
mkdir -p "$DEST"
for f in gpt.pth dvae.pth bigvgan_generator.pth bpe.model config.yaml; do
    if [ -f "$DEST/$f" ]; then
        echo "exists: $DEST/$f"
        continue
    fi
    echo "downloading $f ..."
    curl -fL --retry 3 -o "$DEST/$f" "$BASE/$f"
done
echo "done → $DEST"
