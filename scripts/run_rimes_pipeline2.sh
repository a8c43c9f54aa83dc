#!/bin/bash
# Improved second-dataset-family drive (v2).  The first RIMES run
# (run_rimes_pipeline.sh, 20x50 synthetic lines) was floored by its frozen
# reader: HWR val CER 0.747 on unseen text meant gen-CER could not fall
# below ~0.85.  v2 raises data diversity (60 authors x 80 lines) and the
# HWR budget (20k iters), then runs the GAN at the full reference budget
# (175k, matching configs/cf_IAMslant_...sMG.json:71).  Retry loops because
# the dev-env TPU tunnel leaks host RSS per dispatch; every stage soft
# resumes (-r).
set -u
cd "$(dirname "$0")/.."
mkdir -p saved

if [ ! -f saved/syn_rimes_text.txt ]; then
  python scripts/make_synthetic_corpus.py saved/syn_rimes_text.txt 5000 rimes
fi

echo "[rimes2] stage 1: HWR pretrain" >> saved/pipeline.log
ok=0
for a in 1 2 3; do
  if python train.py -c configs/syn_rimes_hwr2.json -r \
      >> saved/syn_rimes_hwr2.log 2>&1; then ok=1; break; fi
  echo "[rimes2] hwr attempt $a died; retrying" >> saved/pipeline.log
done
if [ "$ok" != 1 ]; then
  echo "[rimes2] HWR failed after 3 attempts" >> saved/pipeline.log
  exit 1
fi

echo "[rimes2] stage 2: autoencoder pretrain" >> saved/pipeline.log
ok=0
for a in 1 2 3; do
  if python train.py -c configs/syn_rimes_auto2.json -r \
      >> saved/syn_rimes_auto2.log 2>&1; then ok=1; break; fi
  echo "[rimes2] auto attempt $a died; retrying" >> saved/pipeline.log
done
if [ "$ok" != 1 ]; then
  echo "[rimes2] auto failed after 3 attempts" >> saved/pipeline.log
  exit 1
fi

echo "[rimes2] stage 3: GAN (175k)" >> saved/pipeline.log
ok=0
for a in $(seq 1 24); do
  if python train.py -c configs/syn_rimes_gan2.json -r \
      >> saved/syn_rimes_gan2.log 2>&1; then
    ok=1; break
  fi
  echo "[rimes2] GAN attempt $a died; retrying" >> saved/pipeline.log
  sleep 5
done
if [ "$ok" = 1 ]; then
  echo "[rimes2] done" >> saved/pipeline.log
else
  echo "[rimes2] GAN failed after 24 attempts" >> saved/pipeline.log
  exit 1
fi
