#!/bin/bash
# Second-dataset-family drive: the full 3-stage recipe on the RIMES charset
# (78 classes incl. accented chars) over the synthetic corpus.  Mirrors
# run_synthetic_pipeline.sh at reduced GAN budget — the goal is to show the
# RIMES-charset path (configs/cf_RIMESLines_* lineage) trains end-to-end
# with declining gen-CER, not to reach the IAM run's 460k consolidation.
# Retry loops because the dev-env TPU tunnel leaks host RSS per dispatch.
set -u
cd "$(dirname "$0")/.."
mkdir -p saved

if [ ! -f saved/syn_rimes_text.txt ]; then
  python scripts/make_synthetic_corpus.py saved/syn_rimes_text.txt 5000 rimes
fi

echo "[rimes] stage 1: HWR pretrain" >> saved/pipeline.log
ok=0
for a in 1 2 3; do
  if python train.py -c configs/syn_rimes_hwr.json -r \
      >> saved/syn_rimes_hwr.log 2>&1; then ok=1; break; fi
  echo "[rimes] hwr attempt $a died; retrying" >> saved/pipeline.log
done
if [ "$ok" != 1 ]; then
  echo "[rimes] HWR failed after 3 attempts" >> saved/pipeline.log
  exit 1
fi

echo "[rimes] stage 2: autoencoder pretrain" >> saved/pipeline.log
ok=0
for a in 1 2 3; do
  if python train.py -c configs/syn_rimes_auto.json -r \
      >> saved/syn_rimes_auto.log 2>&1; then ok=1; break; fi
  echo "[rimes] auto attempt $a died; retrying" >> saved/pipeline.log
done
if [ "$ok" != 1 ]; then
  echo "[rimes] auto failed after 3 attempts" >> saved/pipeline.log
  exit 1
fi

echo "[rimes] stage 3: GAN" >> saved/pipeline.log
ok=0
for a in $(seq 1 8); do
  if python train.py -c configs/syn_rimes_gan.json -r \
      >> saved/syn_rimes_gan.log 2>&1; then
    ok=1; break
  fi
  echo "[rimes] GAN attempt $a died; retrying" >> saved/pipeline.log
  sleep 5
done
if [ "$ok" = 1 ]; then
  echo "[rimes] done" >> saved/pipeline.log
else
  echo "[rimes] GAN failed after 8 attempts" >> saved/pipeline.log
  exit 1
fi
