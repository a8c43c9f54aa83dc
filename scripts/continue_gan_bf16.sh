#!/bin/bash
# Round-2 continuation: resume syn_gan_long at its latest checkpoint with
# bfloat16 MXU compute and halved LR (2e-4 -> 1e-4) to consolidate past the
# post-236k val_gen_CER plateau.  Retry loop because the dev-env TPU tunnel
# leaks host RSS per dispatch and OOM-kills long incarnations.
set -u
cd "$(dirname "$0")/.."
for attempt in $(seq 1 12); do
  if python train.py -c configs/syn_gan_long.json -r -i 460000 \
      -a model.compute_dtype=bfloat16 \
      -a optimizer.lr=0.0001 \
      -a optimizer_discriminator.lr=0.0001 \
      >> saved/syn_gan_bf16_cont.log 2>&1; then
    echo "[cont] done" >> saved/pipeline.log
    exit 0
  fi
  echo "[cont] attempt $attempt died; retrying" >> saved/pipeline.log
  sleep 10
done
echo "[cont] failed after 12 attempts" >> saved/pipeline.log
exit 1
