#!/bin/bash
# Round-4 drive chain: wait for the live IAM v3 pipeline to finish, take a
# quick IAM quality reading (early signal while there is time to react),
# then run the RIMES v3 pipeline.  The final measurement pass
# (scripts/round4_results.sh) is launched separately once training is
# stopped — the TPU tunnel is exclusive, so everything is strictly
# sequential.
set -u
cd "$(dirname "$0")/.."

IAM_PID=${1:-}
if [ -n "$IAM_PID" ]; then
  echo "[chain4] waiting on IAM pipeline pid $IAM_PID" >> saved/pipeline.log
  while kill -0 "$IAM_PID" 2>/dev/null; do sleep 30; done
fi
echo "[chain4] IAM pipeline done; quick quality reading" >> saved/pipeline.log

sleep 45   # let the tunnel release (exclusive device acquisition)
mkdir -p docs/results/r4
# small early reading: signal AND compile prewarm for the measurement pass
# (same compiled shapes; n-gen/max_batches only change trip counts)
timeout 1500 python evaluate.py -c configs/syn_gan3.json -k saved/syn_gan3 \
    --ckpt-name model_best --quality --n-gen 32 -n 24 \
    --texts saved/syn_text.txt \
    > docs/results/r4/quality_iam3_early.json 2>> saved/pipeline.log \
  && echo "[chain4] early IAM quality -> docs/results/r4/quality_iam3_early.json" \
       >> saved/pipeline.log \
  || echo "[chain4] early IAM quality FAILED" >> saved/pipeline.log

echo "[chain4] starting RIMES v3 pipeline" >> saved/pipeline.log
bash scripts/run_rimes_pipeline3.sh
echo "[chain4] RIMES pipeline rc=$?" >> saved/pipeline.log
echo "[chain4] done" >> saved/pipeline.log
