#!/usr/bin/env bash
# Production SD-1.5 ConsistencySolver PPO launch (reference run_ppo.sh parity).
set -e
cd "$(dirname "$0")/.."
python scripts/train_sd15.py --preset sd15_ppo \
  --set model.pretrained_path="${PRETRAINED:-ckpts/sd15}" \
  --set data.train_data_dir="${DATA_DIR:-data/teacher/sd15}" \
  --set reward.encoder_checkpoint="${REWARD_CKPT:-}" \
  --set train.output_dir="${OUTPUT_DIR:-runs/sd15_ppo}" \
  "$@"
