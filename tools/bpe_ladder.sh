#!/bin/bash
# BPE delta-vs-recount crossover ladder: replicated sf0.1 corpora.
# Usage: tools/bpe_ladder.sh [reps...]  (default: 1 4 8)
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
REPS="${@:-1 4 8}"
for r in $REPS; do
  echo "=== rep=$r $(date +%H:%M:%S) ==="
  java $AO -Xmx24g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.BpeProbe /root/testdata/sf0.1 64 8 "$r" 2>/dev/null | grep probe
done
echo "=== ladder done $(date +%H:%M:%S) ==="
