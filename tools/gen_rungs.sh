#!/usr/bin/env bash
# Regenerate every big-rung fixture the scale/recall tests assume-gate on
# (VERDICT r14 item 4: one-command rung regeneration). Deterministic: both
# generators fix their numpy seed, so each rung rebuilds byte-identically.
#
#   /tmp/sf1real   gen_sf1.py MULT=1   (10x the driver's sf0.1)
#   /tmp/sf3real   gen_sf1.py MULT=3
#   /tmp/sf10real  gen_sf1.py MULT=10  (100x bench scale — the full-suite rung)
#   /tmp/emb4m     gen_embeddings.py   (4.2M vectors — two-level IVF gate)
#
# Usage: tools/gen_rungs.sh [rung...]     # default: all four
# After it finishes, `sbt test` runs the full suite with 0 canceled
# (336/336 at round 15).
# Verification infrastructure — NOT part of the engine.
set -euo pipefail
cd "$(dirname "$0")/.."

RUNGS=("${@:-sf1real sf3real sf10real emb4m}")
# shellcheck disable=SC2128,SC2086
RUNGS=($RUNGS)

for rung in "${RUNGS[@]}"; do
  case "$rung" in
    sf1real)  python3 tools/gen_sf1.py /tmp/sf1real 1 ;;
    sf3real)  python3 tools/gen_sf1.py /tmp/sf3real 3 ;;
    sf10real) python3 tools/gen_sf1.py /tmp/sf10real 10 ;;
    emb4m)    python3 tools/gen_embeddings.py /tmp/emb4m 4200000 ;;
    *) echo "unknown rung: $rung (want sf1real|sf3real|sf10real|emb4m)" >&2; exit 2 ;;
  esac
done
echo "[gen-rungs] done: ${RUNGS[*]}"
