#!/bin/bash
# Round-4 measurement pass (VERDICT r3 #1: "publish the measurement pass —
# nothing else counts until this lands").  Run ONLY after training is
# stopped — the TPU tunnel is exclusive.
#
# Everything lands in COMMITTED paths (docs/results/r4 + docs/samples/r4),
# not /tmp: round 3 wrote to /tmp/r3 and shipped nothing.  Ordered so the
# cheapest/highest-value artifacts land first: CPU-only curves/strips, then
# bench, then the MFU item (VERDICT r3 #4), then quality JSONs.
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/results/r4 docs/samples/r4
R=docs/results/r4

echo "== curves + sample strips (CPU only, no chip needed) =="
python - <<'EOF'
import os
from handwriting_line_generation_tpu.utils.train_log import TrainLog
for run, png in [("saved/syn_gan3", "docs/samples/r4/gan3_curves.png"),
                 ("saved/syn_rimes_gan3",
                  "docs/samples/r4/rimes_gan3_curves.png")]:
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
  [ -n "$g" ] && cp "$d/$g" "docs/samples/r4/${run}_gen_strip.png"
  [ -n "$r" ] && cp "$d/$r" "docs/samples/r4/${run}_recon_strip.png"
done

# the axon tunnel is released asynchronously when the previous trainer
# exits; a process that races the release blocks silently on device
# acquisition (that is how round 3's early quality pass lost its whole
# 40-min budget) — settle first, and retry every chip command once
sleep 45

chip() {  # budget_secs, out_file, cmd...
  local budget=$1 out=$2; shift 2
  for attempt in 1 2; do
    if timeout "$budget" "$@" > "$out.tmp"; then
      mv "$out.tmp" "$out"; cat "$out"; return 0
    fi
    echo "[chip] attempt $attempt of '$*' failed; settling + retrying"
    sleep 30
  done
  rm -f "$out.tmp"; echo "[chip] FAILED twice: $*"
}

run_quality() {  # cfg, run_dir, ckpt, texts, out_json, [render_dir]
  local cfg=$1 run=$2 ckpt=$3 texts=$4 out=$5 render=${6:-}
  [ -f "$run/$ckpt.msgpack" ] || [ -f "$run/$ckpt" ] || \
    { echo "skip $run/$ckpt (missing)"; return 0; }
  for attempt in 1 2; do
    if timeout 1500 python evaluate.py -c "$cfg" -k "$run" \
        --ckpt-name "$ckpt" --quality --n-gen 200 --texts "$texts" \
        ${render:+-o "$render"} > "$out.tmp"; then
      mv "$out.tmp" "$out"
      echo "quality -> $out"
      return 0
    fi
    echo "quality $run/$ckpt attempt $attempt FAILED; retrying"
    sleep 20
  done
  rm -f "$out.tmp"
  echo "quality $run/$ckpt FAILED twice"
}

# Quality lands FIRST (VERDICT r3 #1: the quality JSONs are the round's
# headline artifact); bench and MFU follow.  A small prewarm reading
# compiles the gen/eval shapes so the three full passes run warm.
echo "== IAM v3 quality (realism gap + FID + writer-ID) =="
[ -f saved/syn_gan3/model_best.msgpack ] && \
  timeout 1800 python evaluate.py -c configs/syn_gan3.json -k saved/syn_gan3 \
      --ckpt-name model_best --quality --n-gen 32 -n 24 \
      --texts saved/syn_text.txt > $R/quality_iam3_early.json \
    && cat $R/quality_iam3_early.json
run_quality configs/syn_gan3.json saved/syn_gan3 model_best \
    saved/syn_text.txt $R/quality_iam3_best.json docs/samples/r4
run_quality configs/syn_gan3.json saved/syn_gan3 checkpoint-latest-swa \
    saved/syn_text.txt $R/quality_iam3_swa.json
run_quality configs/syn_gan3.json saved/syn_gan3 checkpoint-latest \
    saved/syn_text.txt $R/quality_iam3_latest.json

echo "== RIMES v3 quality =="
run_quality configs/syn_rimes_gan3.json saved/syn_rimes_gan3 model_best \
    saved/syn_rimes_text.txt $R/quality_rimes3_best.json docs/samples/r4/rimes
run_quality configs/syn_rimes_gan3.json saved/syn_rimes_gan3 \
    checkpoint-latest-swa saved/syn_rimes_text.txt $R/quality_rimes3_swa.json
run_quality configs/syn_rimes_gan3.json saved/syn_rimes_gan3 \
    checkpoint-latest saved/syn_rimes_text.txt $R/quality_rimes3_latest.json

echo "== bench (idle chip) =="
chip 1200 $R/bench.json python bench.py

echo "== training MFU: default vs cached-alignment production path =="
chip 1500 $R/mfu.json python scripts/mfu_report.py
# (--spaced-cache synthesizes its alignment via insert_spaces — no npz
# bank needed)
chip 1500 $R/mfu_cached.json python scripts/mfu_report.py --spaced-cache

# slow tier: already run THIS round on this host while the chip trained
# (CPU-only tier) — recorded in docs/results/r4/slow_tier.txt (9 passed,
# 1:05:21).  Not rerun here: it costs >1h of the 1-CPU host.
echo "round4_results done"
