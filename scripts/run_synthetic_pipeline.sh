#!/bin/bash
# Three-stage training recipe on the synthetic corpus (this env has no IAM
# data).  Mirrors the reference's pipeline (SURVEY.md §7): pretrain HWR ->
# pretrain autoencoder (2tight) -> train the full GAN.  Every stage soft
# resumes (-r), so re-running this script after an interruption continues
# where it left off.  Reference: run_eval.py + notes.txt staged runs.
set -u
cd "$(dirname "$0")/.."
mkdir -p saved

if [ ! -f saved/syn_text.txt ]; then
  python scripts/make_synthetic_corpus.py saved/syn_text.txt 5000
fi

echo "[pipeline] stage 1: HWR pretrain" >> saved/pipeline.log
python train.py -c configs/syn_hwr.json -r >> saved/syn_hwr.log 2>&1 \
  || { echo "[pipeline] HWR stage failed" >> saved/pipeline.log; exit 1; }

echo "[pipeline] stage 2: autoencoder pretrain" >> saved/pipeline.log
python train.py -c configs/syn_auto_2tight.json -r >> saved/syn_auto.log 2>&1 \
  || { echo "[pipeline] auto stage failed" >> saved/pipeline.log; exit 1; }

echo "[pipeline] stage 3: GAN" >> saved/pipeline.log
# The dev-env TPU tunnel leaks host memory per dispatch (~130GB RSS after
# ~120k iterations -> OOM kill).  The GAN stage soft-resumes, so retry in a
# loop: each incarnation continues from checkpoint-latest.
gan_ok=0
for attempt in 1 2 3 4 5 6 7 8; do
  if python train.py -c configs/syn_gan_long.json -r \
      >> saved/syn_gan.log 2>&1; then
    gan_ok=1
    break
  fi
  echo "[pipeline] GAN attempt $attempt died (tunnel leak / OOM); retrying" \
    >> saved/pipeline.log
  sleep 10
done
if [ "$gan_ok" != 1 ]; then
  echo "[pipeline] GAN stage failed after 8 attempts" >> saved/pipeline.log
  exit 1
fi

echo "[pipeline] done" >> saved/pipeline.log
