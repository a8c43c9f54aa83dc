#!/bin/bash
# Round-end measurement pass for the v3 recipes (hard renderer, 60x80,
# 20k-iteration readers, 175k GANs).  Run ONLY after training is stopped
# (the TPU tunnel is exclusive).  Produces docs/samples/r3 + JSON metrics.
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/samples/r3 /tmp/r3

echo "== bench =="
timeout 1200 python bench.py | tee /tmp/r3/bench.json

echo "== training MFU (default vs cached-alignment production path) =="
timeout 1800 python scripts/mfu_report.py | tee /tmp/r3/mfu.json
timeout 1800 python scripts/mfu_report.py --spaced-cache | tee /tmp/r3/mfu_cached.json

run_quality() {  # cfg, run_dir, ckpt, texts, out_json, [render_dir]
  local cfg=$1 run=$2 ckpt=$3 texts=$4 out=$5 render=${6:-}
  [ -f "$run/$ckpt.msgpack" ] || [ -f "$run/$ckpt" ] || \
    { echo "skip $run/$ckpt (missing)"; return 0; }
  timeout 1800 python evaluate.py -c "$cfg" -k "$run" --ckpt-name "$ckpt" \
      --quality --n-gen 200 --texts "$texts" \
      ${render:+-o "$render"} | tee "$out"
}

echo "== IAM v3 quality =="
run_quality configs/syn_gan3.json saved/syn_gan3 model_best \
    saved/syn_text.txt /tmp/r3/quality_iam3_best.json docs/samples/r3
run_quality configs/syn_gan3.json saved/syn_gan3 checkpoint-latest-swa \
    saved/syn_text.txt /tmp/r3/quality_iam3_swa.json
run_quality configs/syn_gan3.json saved/syn_gan3 checkpoint-latest \
    saved/syn_text.txt /tmp/r3/quality_iam3_latest.json

echo "== RIMES v3 quality =="
run_quality configs/syn_rimes_gan3.json saved/syn_rimes_gan3 model_best \
    saved/syn_rimes_text.txt /tmp/r3/quality_rimes3_best.json
run_quality configs/syn_rimes_gan3.json saved/syn_rimes_gan3 \
    checkpoint-latest-swa saved/syn_rimes_text.txt /tmp/r3/quality_rimes3_swa.json
run_quality configs/syn_rimes_gan3.json saved/syn_rimes_gan3 \
    checkpoint-latest saved/syn_rimes_text.txt /tmp/r3/quality_rimes3_latest.json

echo "== curves =="
python - <<'EOF'
import os
from handwriting_line_generation_tpu.utils.train_log import TrainLog
for run, png in [("saved/syn_gan3", "docs/samples/r3/gan3_curves.png"),
                 ("saved/syn_rimes_gan3",
                  "docs/samples/r3/rimes_gan3_curves.png")]:
    path = os.path.join(run, "train_log.json")
    if not os.path.exists(path):
        print("skip", path)
        continue
    TrainLog.load(path).plot(png, keys=[
        "val_gen_CER", "val_recon_CER", "autoLoss", "countLoss",
        "discriminatorLoss"])
    print("curves ->", png)
EOF

for run in syn_gan3 syn_rimes_gan3; do
  d=saved/$run/samples
  [ -d "$d" ] || continue
  g=$(ls -t "$d" | grep gen.png | head -1)
  r=$(ls -t "$d" | grep recon.png | head -1)
  [ -n "$g" ] && cp "$d/$g" "docs/samples/r3/${run}_gen_strip.png"
  [ -n "$r" ] && cp "$d/$r" "docs/samples/r3/${run}_recon_strip.png"
done
echo done
