#!/bin/bash
# Round-5 measurement pass (VERDICT r4 #1: third and final ask — commit the
# numbers).  Run ONLY after training is stopped: the TPU tunnel is
# exclusive.  Everything lands in COMMITTED paths (docs/results/r5 +
# docs/samples/r5) and the script commits them itself, so a session death
# after the pass still ships the evidence.
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/results/r5 docs/samples/r5
R=docs/results/r5

echo "== curves + sample strips (CPU only, no chip needed) =="
JAX_PLATFORMS=cpu python - <<'EOF'
import os
from handwriting_line_generation_tpu.utils.train_log import TrainLog
for run, png in [("saved/syn_gan3", "docs/samples/r5/gan3_curves.png"),
                 ("saved/syn_rimes_gan3",
                  "docs/samples/r5/rimes_gan3_curves.png")]:
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
  [ -n "$g" ] && cp "$d/$g" "docs/samples/r5/${run}_gen_strip.png"
  [ -n "$r" ] && cp "$d/$r" "docs/samples/r5/${run}_recon_strip.png"
done

# settle: the previous holder's tunnel release is async (utils/acquire.py)
sleep 75

run_quality() {  # cfg, run_dir, ckpt, texts, out_json, [render_dir]
  local cfg=$1 run=$2 ckpt=$3 texts=$4 out=$5 render=${6:-}
  [ -f "$run/$ckpt.msgpack" ] || { echo "skip $run/$ckpt (missing)"; return 0; }
  for attempt in 1 2; do
    # -n 150: the full valid sweep (1200 batches) blows the timeout; 150
    # batches = 600 lines of style/FID statistics, plenty for stable
    # metrics (observed live round 5: max_batches=None ran >13 min with no
    # end in sight)
    if timeout 1500 python evaluate.py -c "$cfg" -k "$run" \
        --ckpt-name "$ckpt" --quality --n-gen 200 -n 150 --texts "$texts" \
        ${render:+-o "$render"} > "$out.tmp" 2>>saved/results5.log; then
      mv "$out.tmp" "$out"
      echo "quality -> $out"; cat "$out"
      return 0
    fi
    echo "quality $run/$ckpt attempt $attempt FAILED; settling"
    sleep 75
  done
  rm -f "$out.tmp"
  echo "quality $run/$ckpt FAILED twice"
}

chip() {  # budget_secs, out_file, cmd...
  local budget=$1 out=$2; shift 2
  for attempt in 1 2; do
    if timeout "$budget" "$@" > "$out.tmp" 2>>saved/results5.log; then
      mv "$out.tmp" "$out"; cat "$out"; return 0
    fi
    echo "[chip] attempt $attempt of '$*' failed; settling + retrying"
    sleep 75
  done
  rm -f "$out.tmp"; echo "[chip] FAILED twice: $*"
}

commit_r5() {
  for i in 1 2 3; do
    git add docs/results/r5 docs/samples/r5 2>/dev/null && \
    git commit -q -m "$1" -- docs/results/r5 docs/samples/r5 && return 0
    sleep 20
  done
}

# Quality first (the round's headline artifact), committed checkpoint
# family by checkpoint family so a mid-pass death still ships something.
echo "== IAM v3 quality (realism gap + FID + writer-ID), 3 checkpoints =="
run_quality configs/syn_gan3.json saved/syn_gan3 model_best \
    saved/syn_text.txt $R/quality_iam3_best.json docs/samples/r5
run_quality configs/syn_gan3.json saved/syn_gan3 checkpoint-latest-swa \
    saved/syn_text.txt $R/quality_iam3_swa.json
run_quality configs/syn_gan3.json saved/syn_gan3 checkpoint-latest \
    saved/syn_text.txt $R/quality_iam3_latest.json
commit_r5 "round-5 results: IAM v3 quality JSONs (best/SWA/latest) + strips"

echo "== RIMES v3 quality =="
run_quality configs/syn_rimes_gan3.json saved/syn_rimes_gan3 model_best \
    saved/syn_rimes_text.txt $R/quality_rimes3_best.json docs/samples/r5/rimes
run_quality configs/syn_rimes_gan3.json saved/syn_rimes_gan3 \
    checkpoint-latest-swa saved/syn_rimes_text.txt $R/quality_rimes3_swa.json
run_quality configs/syn_rimes_gan3.json saved/syn_rimes_gan3 \
    checkpoint-latest saved/syn_rimes_text.txt $R/quality_rimes3_latest.json
commit_r5 "round-5 results: RIMES v3 quality JSONs + strips"

echo "== training MFU: default vs cached-alignment production path =="
chip 1500 $R/mfu.json python scripts/mfu_report.py
chip 1500 $R/mfu_cached.json python scripts/mfu_report.py --spaced-cache
commit_r5 "round-5 results: MFU report (default + spaced-cache paths)"

echo "== bench (idle chip, run LAST so nothing contends) =="
sleep 75
chip 1200 $R/bench.json python bench.py
commit_r5 "round-5 results: idle-chip bench"

echo "round5_results done"
