#!/bin/bash
# TPU tunnel-wedge watcher: probe the device with a REAL-COMPUTE op until
# it answers, then launch the given command and exit.
#
# This is the recovery path that actually saved round 4 (docs/RESULTS.md
# device-hang forensics): after a wedge, trivial RPCs (backend init,
# jnp.zeros) still answer while execution dispatches hang forever, so the
# in-process acquisition probe cannot see the wedge — only a real matmul
# can.  Recovery is spontaneous but slow (minutes to tens of minutes), and
# every timed-out probe is itself an unclean client death that can
# re-poison the lease, so probe GENTLY: one 256x256 matmul with a 90 s
# timeout every ~8.5 min.
#
# Usage: tunnel_watch.sh <command...>
#   e.g. nohup bash scripts/tunnel_watch.sh bash scripts/r4_full.sh &
set -u
LOG=${TUNNEL_WATCH_LOG:-/tmp/tunnel_watch.log}
TRIES=${TUNNEL_WATCH_TRIES:-36}
for i in $(seq 1 "$TRIES"); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
assert float((x @ x).sum()) == 16777216.0
print('COMPUTE OK')" >> "$LOG" 2>&1; then
    echo "$(date +%T) try $i: device healthy -> launching: $*" >> "$LOG"
    exec "$@"
  fi
  echo "$(date +%T) try $i: device still hung" >> "$LOG"
  sleep 510
done
echo "$(date +%T) giving up after $TRIES tries" >> "$LOG"
exit 1
