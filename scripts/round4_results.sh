#!/bin/bash
# Round-5 note: the long-running r4_full chain (launched before round 5
# began) invokes this script as its measurement step.  The round-5 pass
# supersedes it — same artifacts, committed incrementally, under
# docs/results/r5 + docs/samples/r5 — so delegate.
exec bash "$(dirname "$0")/round5_results.sh"
