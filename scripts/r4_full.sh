#!/bin/bash
# Round-4 full drive (fresh-VM restart): the environment reset wiped every
# checkpoint AGAIN mid-round, so this script re-runs the whole round-4 plan
# end-to-end with no human in the loop:
#   1. IAM v3 pipeline (HWR -> AE -> 175k GAN, live alignment per f26a2a7)
#   2. early IAM quality reading (signal + compile prewarm)
#   3. RIMES v3 pipeline (HWR -> AE -> GAN from the spaced_loc cache,
#      adaptive budget sized to the measurement cutoff)
#   4. scripts/round4_results.sh (quality JSONs, strips, curves, bench, MFU)
#   5. commit the committed-path artifacts (docs/results/r4, docs/samples/r4)
# The TPU tunnel is exclusive -> strictly sequential.
set -u
cd "$(dirname "$0")/.."
mkdir -p saved docs/results/r4
echo "[r4full] start $(date -u +%FT%TZ)" >> saved/pipeline.log

bash scripts/run_iam_pipeline3.sh
echo "[r4full] IAM pipeline rc=$? at $(date -u +%FT%TZ)" >> saved/pipeline.log

sleep 45   # async tunnel release (see utils/acquire.py)
# early reading: quality signal while there is time to react, and compile
# prewarm for the full measurement pass (same compiled shapes)
timeout 1800 python evaluate.py -c configs/syn_gan3.json -k saved/syn_gan3 \
    --ckpt-name model_best --quality --n-gen 32 -n 24 \
    --texts saved/syn_text.txt \
    > docs/results/r4/quality_iam3_early.json 2>> saved/pipeline.log \
  && echo "[r4full] early IAM quality ok" >> saved/pipeline.log \
  || { rm -f docs/results/r4/quality_iam3_early.json; \
       echo "[r4full] early IAM quality FAILED" >> saved/pipeline.log; }

echo "[r4full] starting RIMES v3 pipeline" >> saved/pipeline.log
bash scripts/run_rimes_pipeline3.sh
echo "[r4full] RIMES pipeline rc=$? at $(date -u +%FT%TZ)" >> saved/pipeline.log

sleep 45
bash scripts/round4_results.sh >> saved/pipeline.log 2>&1
echo "[r4full] results pass rc=$? at $(date -u +%FT%TZ)" >> saved/pipeline.log

# Land the evidence even if the interactive session is gone by now.
for i in 1 2 3; do
  if git add docs/results/r4 docs/samples/r4 && \
     git commit -m "Round-4 measurement artifacts: v3 quality JSONs, sample strips, curves, bench, MFU"; then
    break
  fi
  sleep 20
done
echo "[r4full] done $(date -u +%FT%TZ)" >> saved/pipeline.log
