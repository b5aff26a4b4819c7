#!/bin/bash
# Canary-gated bench launcher (round-5): the host suffers multi-hour degraded
# stretches that ceiling probes cannot see (NOTES.md round 4). Loop a pinned
# T4 canary; when it reads inside the clean band (<82 s at 120k), run the
# full bracketed window-median bench and archive it. Sentinel file guards
# against concurrent Spark work contaminating the measurement.
set -u
cd /root/repo
LOG=${LOG:-/tmp/r06_bench_loop.log}
OUT=${OUT:-/root/repo/BENCH/builder_run_r06_A.json}
THRESH=${THRESH:-74}
for i in $(seq 1 28); do
  w=$(python - <<'PY'
import sys
sys.path.insert(0, '.')
import bench
corpus = bench._ensure_corpus(120000)
bench._warm(corpus)
r = bench._run_pipeline_subprocess(4, corpus)
print(r["wall_sec"])
PY
)
  echo "$(date -u +%H:%M:%S) canary T4=${w}s (threshold ${THRESH})" >> "$LOG"
  ok=$(python -c "print(1 if float('${w:-999}') < ${THRESH} else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date -u +%H:%M:%S) host clean -> starting full bench" >> "$LOG"
    touch /tmp/BENCH_RUNNING
    # pass the canary we just measured so bench.py records it instead of
    # spending another ~80 s re-measuring (round-6: canary_t4_sec field)
    BENCH_WINDOWS=${BENCH_WINDOWS:-3} BENCH_CANARY_T4="$w" python bench.py > "$OUT" 2>/tmp/r06_bench_err.log
    rc=$?
    rm -f /tmp/BENCH_RUNNING
    echo "$(date -u +%H:%M:%S) bench done rc=$rc -> $OUT" >> "$LOG"
    exit $rc
  fi
  sleep 480
done
echo "$(date -u +%H:%M:%S) gave up after 28 canaries" >> "$LOG"
exit 1
