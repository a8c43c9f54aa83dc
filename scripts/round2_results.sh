#!/bin/bash
# Round-end measurement pass. Run ONLY after training is stopped (the TPU
# tunnel is exclusive). Produces docs/samples + JSON metric files.
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/samples/r2 /tmp/r2

echo "== bench =="
timeout 1200 python bench.py | tee /tmp/r2/bench.json

echo "== mfu =="
timeout 1800 python scripts/mfu_report.py --iters 21 | tee /tmp/r2/mfu.json

echo "== quality (model_best) =="
timeout 1800 python evaluate.py -c configs/syn_gan_long.json \
    -k saved/syn_gan_long --ckpt-name model_best --quality \
    --n-gen 200 --texts saved/syn_text.txt -o docs/samples/r2 \
    | tee /tmp/r2/quality.json

if [ -f saved/syn_gan_long/checkpoint-latest-swa.msgpack ]; then
  echo "== quality (SWA average) =="
  timeout 1800 python evaluate.py -c configs/syn_gan_long.json \
      -k saved/syn_gan_long --ckpt-name checkpoint-latest-swa --quality \
      --n-gen 200 --texts saved/syn_text.txt \
      | tee /tmp/r2/quality_swa.json
fi

echo "== quality (latest) =="
timeout 1800 python evaluate.py -c configs/syn_gan_long.json \
    -k saved/syn_gan_long --ckpt-name checkpoint-latest --quality \
    --n-gen 200 --texts saved/syn_text.txt \
    | tee /tmp/r2/quality_latest.json

echo "== quality (RIMES model_best) =="
if [ -d saved/syn_rimes_gan ]; then
  timeout 1800 python evaluate.py -c configs/syn_rimes_gan.json \
      -k saved/syn_rimes_gan --ckpt-name model_best --quality \
      --n-gen 200 --texts saved/syn_rimes_text.txt \
      | tee /tmp/r2/quality_rimes.json
fi

echo "== curves =="
python - <<'EOF'
import json
import os

from handwriting_line_generation_tpu.utils.train_log import TrainLog

path = "saved/syn_gan_long/train_log.json"
if os.path.exists(path):
    log = TrainLog.load(path)
else:                    # reconstruct from the run's stdout JSON lines
    log = TrainLog()
    it = 0
    for line in open("saved/syn_gan.log"):
        line = line.strip()
        if not line.startswith("{"):
            continue
        e = json.loads(line)
        it = e.get("iteration", it)
        log.entries.append({"iteration": it, **e})
log.plot("docs/samples/r2/gan_curves.png",
         keys=["val_gen_CER", "val_recon_CER", "autoLoss", "countLoss",
               "discriminatorLoss"])
print("curves ->", "docs/samples/r2/gan_curves.png")
EOF

cp saved/syn_gan_long/samples/$(ls -t saved/syn_gan_long/samples | grep gen.png | head -1) docs/samples/r2/latest_gen_strip.png
cp saved/syn_gan_long/samples/$(ls -t saved/syn_gan_long/samples | grep recon.png | head -1) docs/samples/r2/latest_recon_strip.png
echo done
