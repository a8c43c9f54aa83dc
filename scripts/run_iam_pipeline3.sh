#!/bin/bash
# Round-3 IAM-charset drive (v3): the "hard" synthetic corpus
# (data/synthetic.py render_line_hard — allographs, curved strokes,
# baseline wobble, elastic warp, ink/brightness/noise; disjoint val
# authors).  Rationale: the v2 reader saturated at val CER 0.000
# (VERDICT r2 weak #2), so gen-CER stopped discriminating generator
# quality; v3 is calibrated so the frozen reader lands at CER 0.05-0.15.
# GAN budget = the full reference 175k (cf_IAMslant_...sMG.json:71).
set -u
cd "$(dirname "$0")/.."
mkdir -p saved

if [ ! -f saved/syn_text.txt ]; then
  python scripts/make_synthetic_corpus.py saved/syn_text.txt 5000
fi

stage() {  # name, config, attempts
  local name=$1 cfg=$2 tries=$3 ok=0
  sleep 75  # settle: the previous stage's tunnel release is async;
            # launching into it wedges the remote session
  echo "[iam3] stage $name" >> saved/pipeline.log
  for a in $(seq 1 "$tries"); do
    if python train.py -c "$cfg" -r >> "saved/${name}.log" 2>&1; then
      ok=1; break
    fi
    echo "[iam3] $name attempt $a died; retrying" >> saved/pipeline.log
    sleep 60   # settle: the tunnel release is async; a fast retry races it
  done
  [ "$ok" = 1 ] || { echo "[iam3] $name FAILED" >> saved/pipeline.log; exit 1; }
}

stage syn_hwr3 configs/syn_hwr3.json 3
stage syn_auto3 configs/syn_auto3.json 3
# NOTE: the IAM v3 GAN trains with LIVE alignment — the precomputed
# spaced_loc cache was reverted for this family after the cached run
# collapsed to blank output (commit f26a2a7; docs/RESULTS.md round-4
# forensics).  RIMES keeps its round-3-proven cache.
stage syn_gan3 configs/syn_gan3.json 24
echo "[iam3] done" >> saved/pipeline.log
