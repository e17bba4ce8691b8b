#!/usr/bin/env bash
# Live executor-loss fault-tolerance check for the crawl loop's file-backed
# sketch/state design: run the SAME crawl twice — once undisturbed on
# local[8], once under local-cluster[2,2] with one executor JVM SIGKILLed
# mid-run (the standalone worker relaunches it; Spark retries the stage;
# seen-sketch shards re-read their per-generation checkpoint files) — and
# assert the final seen + outcomes tables are identical.
#
# Requires: sbt package first; duckdb available to python3 (driver-side).
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
JAR=$PWD/target/scala-2.13/scraperspark_2.13-0.1.0.jar

rm -rf /tmp/graft-elt-base /tmp/graft-elt-kill
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.CrawlMain /tmp/graft-elt-base 60 120 5 12 3" >/dev/null 2>&1

SPARK_GRAFT_CPUS=4 \
SPARK_GRAFT_CONF="spark.master=local-cluster[2,2,4096];spark.jars=$JAR" \
  sbt -batch "runMain graft.CrawlMain /tmp/graft-elt-kill 60 120 5 12 3" \
  > /tmp/graft-elt-kill.log 2>&1 &
CRAWL=$!
sleep 45
VICTIM=$(ps aux | grep CoarseGrainedExecutorBackend | grep -v grep | awk '{print $2}' | head -1)
echo "SIGKILL executor pid $VICTIM"
kill -9 "$VICTIM"
wait $CRAWL

grep -q "Lost executor" /tmp/graft-elt-kill.log \
  || { echo "FAIL: kill landed outside the run (no Lost executor event)"; exit 1; }

python3 - <<'EOF'
import duckdb, sys
con = duckdb.connect()
def state(d):
    seen = con.execute(f"SELECT url, gen FROM read_parquet('{d}/seen/gen=*/*.parquet') ORDER BY url").fetchall()
    out = con.execute(f"SELECT gen, url, outcome, error_kind FROM read_parquet('{d}/outcomes/gen=*/*.parquet') ORDER BY gen, url, outcome").fetchall()
    return seen, out
b, k = state('/tmp/graft-elt-base'), state('/tmp/graft-elt-kill')
ok = b == k
print('seen rows', len(b[0]), 'outcomes', len(b[1]), 'identical:', ok)
sys.exit(0 if ok else 1)
EOF
echo "PASS: crawl identical through a live executor SIGKILL"
