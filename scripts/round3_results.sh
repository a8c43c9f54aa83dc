#!/bin/bash
# Superseded: the round-3 chain (scripts/r3_chain.sh, still running when
# round 4 started) invokes this path after the RIMES v3 pipeline finishes.
# Round 4 extended the quality harness (realism gap, degraded readback) and
# moved artifacts to committed paths — forward to the round-4 pass.
exec bash "$(dirname "$0")/round4_results.sh"
