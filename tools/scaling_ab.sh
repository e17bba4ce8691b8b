#!/usr/bin/env bash
# Interleaved, taskset-pinned N-vs-4N executor scaling measurement
# (BENCH.md §2c protocol, isolation-hardened): fresh JVMs per sample,
# each executor JVM pinned to its own disjoint core range and the driver
# to a fixed top slice (SPARK_GRAFT_PIN=1 → ScalingBench pins after
# executor registration, before warmup), loadavg recorded per sample,
# configs alternated A,B,A,B so co-tenant drift hits both equally.
#
# Usage: tools/scaling_ab.sh [pairs] [cfgA] [cfgB] [out.jsonl]
#   cfgX is a local-cluster spec "W,C,MB"; defaults: A=1,2,6144 B=4,2,6144
#   (the sub-saturation ladder; use 2,2,6144 vs 8,2,6144 for the
#   both-pay-serde ladder).
set -euo pipefail
cd "$(dirname "$0")/.."
PAIRS=${1:-5}; A=${2:-1,2,6144}; B=${3:-4,2,6144}; OUT=${4:-/tmp/scaling_ab.jsonl}
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
JAR=$PWD/target/scala-2.13/scraperspark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package >/dev/null 2>&1

run() {
  local cfg=$1
  local la; la=$(cut -d' ' -f1-3 /proc/loadavg)
  local line
  line=$(SPARK_GRAFT_PIN=1 SPARK_GRAFT_MASTER="local-cluster[$cfg]" \
    SPARK_GRAFT_JARS="$JAR" sbt -batch "runMain graft.ScalingBench" 2>/dev/null \
    | grep -o '{"bench":.*}' | tail -1)
  echo "{\"cfg\":\"$cfg\",\"loadavg\":\"$la\",\"sample\":$line}" >> "$OUT"
  echo "cfg=$cfg loadavg=$la $(echo "$line" | grep -o '"urls_fetched_per_sec":[0-9.]*')"
}

: > "$OUT"
for _ in $(seq 1 "$PAIRS"); do run "$A"; run "$B"; done

python3 - "$OUT" "$A" "$B" <<'EOF'
import json, sys, statistics
rows = [json.loads(l) for l in open(sys.argv[1])]
def cores(cfg): w, c, _ = cfg.split(","); return int(w) * int(c)
byc = {}
for r in rows:
    if r.get("sample"):
        byc.setdefault(r["cfg"], []).append(r["sample"]["urls_fetched_per_sec"])
a, b = sys.argv[2], sys.argv[3]
sa, sb = byc.get(a, []), byc.get(b, [])
if sa and sb:
    ratio = cores(b) / cores(a)
    print(f"A={a}: n={len(sa)} best={max(sa):.0f} median={statistics.median(sa):.0f}")
    print(f"B={b}: n={len(sb)} best={max(sb):.0f} median={statistics.median(sb):.0f}")
    print(f"best-of efficiency:  {(max(sb)/max(sa))/ratio:.3f}")
    print(f"median efficiency:   {(statistics.median(sb)/statistics.median(sa))/ratio:.3f}")
    pair = [(y/x)/ratio for x, y in zip(sa, sb)]
    print(f"same-window pairs:   {['%.2f' % p for p in pair]}")
EOF
