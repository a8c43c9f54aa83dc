#!/bin/bash
# Reset-proof incremental evidence (VERDICT r4 #3): the environment has
# wiped saved/ (all checkpoints) three times, each time converting a whole
# round's chip time into zero committed proof.  This watcher runs beside a
# live training chain and every ~20 min COMMITS a small evidence packet per
# active run — curve PNG + latest sample strips + a progress JSON with the
# tail of train_log.json — so a reset can no longer zero out the round.
#
# CPU-only (matplotlib + file copies): never touches the TPU tunnel.
# Commits use explicit pathspecs so they can't sweep up unrelated staged
# work, and retry on index.lock races with the chain's own final commit.
#
# Usage: nohup bash scripts/evidence_watch.sh [OUTDIR] >/tmp/evidence.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/evidence}
INTERVAL=${EVIDENCE_INTERVAL:-1200}
export JAX_PLATFORMS=cpu

while true; do
  for run_dir in saved/*/; do
    run=$(basename "$run_dir")
    log="$run_dir/train_log.json"
    [ -f "$log" ] || continue
    stamp="$OUT/$run/.last_size"
    size=$(stat -c %s "$log")
    [ "$size" = "$(cat "$stamp" 2>/dev/null)" ] && continue
    mkdir -p "$OUT/$run"
    python - "$run_dir" "$OUT/$run" <<'EOF'
import json, os, shutil, sys
run_dir, out = sys.argv[1], sys.argv[2]
from handwriting_line_generation_tpu.utils.train_log import TrainLog
tl = TrainLog.load(os.path.join(run_dir, "train_log.json"))
entries = tl.entries if hasattr(tl, "entries") else []
try:
    tl.plot(os.path.join(out, "curves.png"))
except Exception as e:          # a curve render must never kill the packet
    print("curve render failed:", e)
tail = entries[-8:] if entries else []
prog = {"run": os.path.basename(run_dir.rstrip("/")),
        "n_entries": len(entries), "tail": tail}
with open(os.path.join(out, "progress.json"), "w") as f:
    json.dump(prog, f, indent=1)
samples = os.path.join(run_dir, "samples")
if os.path.isdir(samples):
    pngs = sorted((os.path.getmtime(os.path.join(samples, p)), p)
                  for p in os.listdir(samples) if p.endswith(".png"))
    for _, p in pngs[-2:]:
        shutil.copy(os.path.join(samples, p), os.path.join(out, p))
print("packet:", prog["n_entries"], "entries")
EOF
    echo "$size" > "$stamp"
    for a in 1 2 3; do
      if git add "$OUT/$run" 2>/dev/null && \
         git commit -q -m "evidence packet: $run ($(date -u +%FT%TZ))" \
             -- "$OUT/$run" 2>/dev/null; then
        echo "[evidence] committed packet for $run"
        break
      fi
      sleep 15
    done
  done
  sleep "$INTERVAL"
done
