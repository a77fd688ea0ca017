#!/usr/bin/env bash
# North-rule deployment evidence via stock spark-submit: the SAME
# validation job at two cluster sizes (N and 4N local cores standing in
# for executor counts — this sandbox has no real cluster) over the same
# input, reporting throughput at both plus the scaling efficiency.
# Each level runs in its own fresh spark-submit JVM against its own
# checkpoint dir. Build the jar first: sbt -batch package
#
# Usage: bin/submit-validate.sh [nRows] [loN] [hiN]
set -euo pipefail
cd "$(dirname "$0")/.."
N_ROWS="${1:-50000}"
LO="${2:-1}"
HI="${3:-4}"
JAR=$(ls target/scala-2.13/crawlfirstspark_2.13-*.jar | grep -v -- -tests | head -1)
WORK=$(mktemp -d /tmp/graft-submit-validate.XXXXXX)
# on failure surface the buried spark stderr, then always clean up the
# multi-GB checkpoint dirs
trap 'st=$?; if [ $st -ne 0 ]; then
        echo "submit-validate FAILED (exit $st); last spark stderr:" >&2
        tail -40 "$WORK/spark.log" >&2 || true
      fi; rm -rf "$WORK"' EXIT

run_level() { # cores outdir
  /opt/spark/bin/spark-submit \
    --master "local[$1]" \
    --conf spark.sql.extensions=graft.plans.GraftExtensions \
    --conf spark.sql.shuffle.partitions="$(( $1 > 8 ? $1 : 8 ))" \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.ui.enabled=false \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.files.maxPartitionBytes=4m \
    --conf spark.sql.files.openCostInBytes=1048576 \
    --driver-memory 8g \
    --class graft.ValidateMain \
    "$JAR" "gen:$N_ROWS" "$2" "submit-local$1" "${WARM_N:-20000}" 2>>"$WORK/spark.log" \
    | grep -E '^(VALIDATE_OK|GEN_ONLY_OK)'
}

# generate the tier once (untimed, gen-only — no validation pass)
WARM_N=0 run_level "$HI" "-" > /dev/null

# min of 2 INTERLEAVED fresh-JVM runs per level (same estimator as
# graft.Bench): shared-host noise only ever adds time, and interleaving
# (N, 4N, N, 4N) makes load drift hit both levels symmetrically instead
# of biasing the ratio. Each run gets a fresh checkpoint dir (a reused
# one would resume into a no-op).
wall_of() { sed 's/.*wall_s=\([0-9.]*\).*/\1/' <<<"$1"; }
LO_T=""; HI_T=""
for i in 1 2; do
  L=$(run_level "$LO" "$WORK/out-lo-$i"); echo "$L"
  H=$(run_level "$HI" "$WORK/out-hi-$i"); echo "$H"
  LO_T="$LO_T $(wall_of "$L")"; HI_T="$HI_T $(wall_of "$H")"
done
python3 - <<PYEOF
lo = min(float(x) for x in "$LO_T".split())
hi = min(float(x) for x in "$HI_T".split())
print(f"SUBMIT_VALIDATE scaling_levels=[$LO,$HI] wall_lo={lo}s wall_hi={hi}s "
      f"lo_runs=[$LO_T ] hi_runs=[$HI_T ] efficiency={lo / (hi * ($HI/$LO)):.3f}")
PYEOF
