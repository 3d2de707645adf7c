#!/usr/bin/env bash
# Workflow dispatcher (reference surface: run.sh:114-183).
#   ./run.sh prepare|extract|train|webui|api|tensorboard|bench|shell|healthcheck
set -euo pipefail
cd "$(dirname "$0")"

CONFIG="${CONFIG:-finetune_models/config.yaml}"
MODEL_DIR="${MODEL_DIR:-finetune_models}"

read_config() {  # read_config <dotted.key> <default>
    python - "$1" "$2" <<'EOF'
import sys, yaml, functools, os
key, default = sys.argv[1], sys.argv[2]
path = os.environ.get("CONFIG", "finetune_models/config.yaml")
try:
    with open(path) as f:
        d = yaml.safe_load(f)
    for part in key.split("."):
        d = d[part]
    print(d)
except Exception:
    print(default)
EOF
}

cmd="${1:-help}"
shift || true

case "$cmd" in
    prepare)
        python tools/prepare_audio_list.py "$@"
        ;;
    extract)
        list_dir=$(CONFIG="$CONFIG" read_config workflow.paths.audio_list_dir finetune_data/audio_list)
        out_dir=$(CONFIG="$CONFIG" read_config workflow.paths.processed_data_dir finetune_data/processed_data)
        shopt -s nullglob
        lists=("$list_dir"/*.txt "$list_dir"/*.list)
        if [ ${#lists[@]} -eq 0 ]; then
            echo "no audio lists in $list_dir — run ./run.sh prepare first" >&2
            exit 1
        fi
        for f in "${lists[@]}"; do
            echo "== extracting $f"
            python -m indextts_tpu.data.extract --audio_list "$f" \
                --config "$CONFIG" --model_dir "$MODEL_DIR" \
                --output_dir "$out_dir" --extract_condition "$@"
        done
        ;;
    train)
        python -m indextts_tpu.train.run --config "$CONFIG" --model_dir "$MODEL_DIR" --resume "$@"
        ;;
    train-dvae)
        out_dir=$(CONFIG="$CONFIG" read_config workflow.paths.processed_data_dir finetune_data/processed_data)
        python -m indextts_tpu.train.dvae --mels "$out_dir" --model_dir "$MODEL_DIR" "$@"
        ;;
    train-vocoder)
        out_dir=$(CONFIG="$CONFIG" read_config workflow.paths.processed_data_dir finetune_data/processed_data)
        python -m indextts_tpu.train.vocoder --processed "$out_dir" --model_dir "$MODEL_DIR" "$@"
        ;;
    api)
        python -m indextts_tpu.serve.api --config "$CONFIG" --model_dir "$MODEL_DIR" "$@"
        ;;
    webui)
        python -m indextts_tpu.serve.webui --config "$CONFIG" --model_dir "$MODEL_DIR" "$@"
        ;;
    tensorboard)
        log_dir=$(CONFIG="$CONFIG" read_config workflow.paths.log_dir logs)
        python -m tensorboard.main --logdir "${RUN_LOG_DIR:-$log_dir}" --host 0.0.0.0 "$@"
        ;;
    bench)
        python bench.py "$@"
        ;;
    healthcheck)
        exec scripts/tpu-healthcheck.sh
        ;;
    test)
        python -m pytest tests/ -x -q "$@"
        # routine quality-metric check (speaker-sim pipeline; BASELINE cfg 3)
        python tools/eval_quality.py --self-test
        ;;
    eval)
        # speaker-sim (+ WER/CER via --asr-cmd) over validation clips
        python tools/eval_quality.py "$@"
        ;;
    export)
        # orbax checkpoint → reference-format .pth (gpt|dvae|vocoder)
        python tools/export_pth.py --config "$CONFIG" "$@"
        ;;
    verify-weights)
        # real-weight gate: convert .pth -> 11-case battery -> quality report
        python tools/verify_weights.py "$@"
        ;;
    shell)
        exec "${SHELL:-/bin/bash}"
        ;;
    *)
        cat <<USAGE
usage: ./run.sh <command>
  prepare      build audio lists from data/ directories
  extract      DVAE codec extraction over all audio lists
  train        LoRA fine-tune (SPMD data-parallel, auto-resume)
  train-dvae   DVAE (mel VQ-VAE) training loop
  train-vocoder  BigVGAN adversarial fine-tune
  api          FastAPI server (:7859)
  webui        Gradio WebUI (:7860)
  tensorboard  training dashboards
  bench        decode throughput benchmark
  healthcheck  TPU availability probe
  test         run the pytest suite + quality-metric self-check
  eval         speaker-sim / WER over clips (tools/eval_quality.py)
  export       orbax checkpoint → reference .pth (tools/export_pth.py)
  verify-weights  real-weight gate: battery + speaker-sim (--dry-run rehearses)
  shell        interactive shell
USAGE
        ;;
esac
