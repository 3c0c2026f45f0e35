#!/bin/bash
# Full-catalog scaled-correctness sweep in resumable chunks (VERDICT r10 #3:
# push the whole catalog to x100). Each chunk is its own driver_sim process
# with a --json-out part, so a hang/fix mid-sweep costs one chunk, not the
# sweep, and a query fixed after launch re-imports cleanly on the next chunk.
#
# Usage: bash scripts/run_scale_sweep.sh SF_DIR OUT_DIR [CHUNK] [TIMEOUT_S]
set -u
SF_DIR="$1"; OUT_DIR="$2"; CHUNK="${3:-10}"; TMO="${4:-3600}"
mkdir -p "$OUT_DIR"
cd "$(dirname "$0")/.."

mapfile -t NAMES < <(python - <<'EOF'
from reciping_data_pipeline_spark.queries import all_queries
for n in all_queries():
    print(n)
EOF
)
TOTAL=${#NAMES[@]}
echo "sweep: $TOTAL queries, chunk=$CHUNK, sf=$SF_DIR"
i=0
ci=0
while [ $i -lt "$TOTAL" ]; do
  part=$(printf "%s/part%03d.json" "$OUT_DIR" "$ci")
  if [ -s "$part" ]; then
    echo "chunk $ci: exists, skipping"
  else
    only=$(IFS=,; echo "${NAMES[*]:$i:$CHUNK}")
    echo "chunk $ci: $only"
    timeout "$TMO" python scripts/driver_sim.py --sf "$SF_DIR" --only "$only" \
      --json-out "$part" > "$OUT_DIR/part$(printf %03d "$ci").log" 2>&1
    rc=$?
    [ $rc -ne 0 ] && echo "chunk $ci: rc=$rc (see log)"
  fi
  i=$((i + CHUNK)); ci=$((ci + 1))
done
echo "sweep done"
