#!/bin/bash
# Improved IAM-charset drive (v2): same recipe as run_synthetic_pipeline.sh
# with the v2 data-diversity bump (60 authors x 80 lines vs 20x50) and a
# longer HWR budget (20k).  Rationale: the frozen reader sets the gen-CER
# floor for the whole GAN; round 2's reader plateaued at val CER 0.226.
# GAN budget = the full reference 175k (cf_IAMslant_...sMG.json:71).
set -u
cd "$(dirname "$0")/.."
mkdir -p saved

if [ ! -f saved/syn_text.txt ]; then
  python scripts/make_synthetic_corpus.py saved/syn_text.txt 5000
fi

echo "[iam2] stage 1: HWR pretrain" >> saved/pipeline.log
ok=0
for a in 1 2 3; do
  if python train.py -c configs/syn_hwr2.json -r \
      >> saved/syn_hwr2.log 2>&1; then ok=1; break; fi
  echo "[iam2] hwr attempt $a died; retrying" >> saved/pipeline.log
done
[ "$ok" = 1 ] || { echo "[iam2] HWR failed" >> saved/pipeline.log; exit 1; }

echo "[iam2] stage 2: autoencoder pretrain" >> saved/pipeline.log
ok=0
for a in 1 2 3; do
  if python train.py -c configs/syn_auto2.json -r \
      >> saved/syn_auto2.log 2>&1; then ok=1; break; fi
  echo "[iam2] auto attempt $a died; retrying" >> saved/pipeline.log
done
[ "$ok" = 1 ] || { echo "[iam2] auto failed" >> saved/pipeline.log; exit 1; }

echo "[iam2] stage 3: GAN (175k)" >> saved/pipeline.log
ok=0
for a in $(seq 1 24); do
  if python train.py -c configs/syn_gan2.json -r \
      >> saved/syn_gan2.log 2>&1; then ok=1; break; fi
  echo "[iam2] GAN attempt $a died; retrying" >> saved/pipeline.log
  sleep 5
done
if [ "$ok" = 1 ]; then
  echo "[iam2] done" >> saved/pipeline.log
else
  echo "[iam2] GAN failed after 24 attempts" >> saved/pipeline.log
  exit 1
fi
