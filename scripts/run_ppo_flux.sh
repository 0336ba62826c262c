#!/usr/bin/env bash
# Production FLUX-Kontext editing PPO launch (edit_ppo/run_ppo.sh parity).
set -e
cd "$(dirname "$0")/.."
python scripts/train_flux.py --preset flux_ppo \
  --set model.pretrained_path="${PRETRAINED:-ckpts/flux}" \
  --set data.train_data_dir="${DATA_DIR:-data/teacher/flux}" \
  --set reward.encoder_checkpoint="${REWARD_CKPT:-}" \
  --set train.output_dir="${OUTPUT_DIR:-runs/flux_ppo}" \
  "$@"
