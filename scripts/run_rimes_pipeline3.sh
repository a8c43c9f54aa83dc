#!/bin/bash
# Round-3 RIMES-charset drive (v3): the "hard" synthetic corpus
# (data/synthetic.py render_line_hard — allographs, curved strokes,
# baseline wobble, elastic warp, ink/brightness/noise; disjoint val
# authors).  Rationale: the v2 reader saturated at val CER 0.000
# (VERDICT r2 weak #2), so gen-CER stopped discriminating generator
# quality; v3 is calibrated so the frozen reader lands at CER 0.05-0.15.
# GAN budget = the full reference 175k (cf_IAMslant_...sMG.json:71).
set -u
cd "$(dirname "$0")/.."
mkdir -p saved

if [ ! -f saved/syn_rimes_text.txt ]; then
  python scripts/make_synthetic_corpus.py saved/syn_rimes_text.txt 5000 rimes
fi

stage() {  # name, config, attempts, [extra train.py args...]
  local name=$1 cfg=$2 tries=$3 ok=0
  shift 3
  sleep 75  # settle: the previous stage's tunnel release is async;
            # launching into it wedges the remote session
  echo "[rimes3] stage $name" >> saved/pipeline.log
  for a in $(seq 1 "$tries"); do
    if python train.py -c "$cfg" -r "$@" >> "saved/${name}.log" 2>&1; then
      ok=1; break
    fi
    echo "[rimes3] $name attempt $a died; retrying" >> saved/pipeline.log
    sleep 60   # settle: the tunnel release is async; a fast retry races it
  done
  [ "$ok" = 1 ] || { echo "[rimes3] $name FAILED" >> saved/pipeline.log; exit 1; }
}

stage syn_rimes_hwr3 configs/syn_rimes_hwr3.json 3
stage syn_rimes_auto3 configs/syn_rimes_auto3.json 3
# Frozen reader + no train-time augmentation make every line's forced
# alignment a constant: precompute the spaced_loc cache once (the
# reference's precomputed-bank workflow, author_hw_dataset.py:283-290) so
# the 175k GAN iterations skip the in-step Viterbi scan.
if [ ! -f saved/syn_rimes_spaced3.npz ]; then
  # settle + timeout + retry (ADVICE r4): this launch sits inside the
  # previous holder's async release window and is exposed to both wedge
  # variants; without a timeout a wedged precompute hangs the chain forever
  sleep 75
  echo "[rimes3] precomputing spaced_loc cache" >> saved/pipeline.log
  pre_ok=0
  for a in 1 2 3; do
    if timeout 2700 python scripts/precompute_spaced.py \
        configs/syn_rimes_gan3.json \
        saved/syn_rimes_spaced3.npz >> saved/syn_rimes_gan3.log 2>&1; then
      pre_ok=1; break
    fi
    echo "[rimes3] spaced precompute attempt $a died; retrying" \
      >> saved/pipeline.log
    rm -f saved/syn_rimes_spaced3.npz
    sleep 75
  done
  [ "$pre_ok" = 1 ] || { echo "[rimes3] spaced precompute FAILED" \
      >> saved/pipeline.log; exit 1; }
fi
# Adaptive GAN budget (round 4): the fresh VM wiped every round-3
# checkpoint, forcing full retrains of BOTH charset families in one round;
# the remaining chip time cannot fit a second full 175k schedule AND the
# measurement pass (VERDICT r3 #1: publishing results outranks everything).
# Size the run to the time that actually remains before the measurement
# cutoff so it COMPLETES (model_best + SWA finalization) instead of dying
# mid-flight.  RIMES_GAN_CUTOFF is an absolute epoch; 0 disables (full
# config budget).  Sustained rate incl. val cadence measured on the IAM v3
# run this round: ~40 it/s on the idle host; use 34 for margin.
# cutoff source: env, else a driver-written file (ephemeral, operational),
# else 0 = full budget
CUTOFF=${RIMES_GAN_CUTOFF:-$(cat /tmp/rimes_gan_cutoff 2>/dev/null || echo 0)}
EXTRA=()
if [ "$CUTOFF" -gt 0 ]; then
  remain=$(( CUTOFF - $(date +%s) ))
  iters=$(( remain * 34 / 1000 * 1000 ))
  [ "$iters" -lt 20000 ] && iters=20000
  [ "$iters" -gt 175000 ] && iters=175000
  if [ "$iters" -lt 175000 ]; then
    swa_start=$(( iters * 2 / 3 / 1000 * 1000 ))
    EXTRA=(-a "trainer.iterations=$iters" -a "trainer.swa_start=$swa_start")
    echo "[rimes3] adaptive GAN budget: ${iters} iters (swa from ${swa_start}," \
         "${remain}s to cutoff)" >> saved/pipeline.log
  fi
fi
stage syn_rimes_gan3 configs/syn_rimes_gan3.json 24 ${EXTRA[@]+"${EXTRA[@]}"}
echo "[rimes3] done" >> saved/pipeline.log
