#!/bin/bash
# Round-3 drive chain: wait for the live IAM v3 pipeline to finish, take a
# quick IAM quality reading (early signal while there is time to react),
# then run the RIMES v3 pipeline and finally the full measurement pass.
# The TPU tunnel is exclusive, so everything is strictly sequential.
set -u
cd "$(dirname "$0")/.."

IAM_PID=${1:-}
if [ -n "$IAM_PID" ]; then
  echo "[chain] waiting on IAM pipeline pid $IAM_PID" >> saved/pipeline.log
  while kill -0 "$IAM_PID" 2>/dev/null; do sleep 30; done
fi
echo "[chain] IAM pipeline done; quick quality reading" >> saved/pipeline.log

mkdir -p /tmp/r3
timeout 2400 python evaluate.py -c configs/syn_gan3.json -k saved/syn_gan3 \
    --ckpt-name model_best --quality --n-gen 200 --texts saved/syn_text.txt \
    > /tmp/r3/quality_iam3_early.json 2>> saved/pipeline.log \
  && echo "[chain] early IAM quality -> /tmp/r3/quality_iam3_early.json" \
       >> saved/pipeline.log \
  || echo "[chain] early IAM quality FAILED" >> saved/pipeline.log

echo "[chain] starting RIMES v3 pipeline" >> saved/pipeline.log
bash scripts/run_rimes_pipeline3.sh
echo "[chain] RIMES pipeline rc=$? ; running round3_results" \
  >> saved/pipeline.log
bash scripts/round3_results.sh >> saved/pipeline.log 2>&1
echo "[chain] done" >> saved/pipeline.log
