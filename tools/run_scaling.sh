#!/bin/bash
# Interleaved scaling measurement: build corpus via bench helper, then
# lo,hi,lo,hi with page-cache warm before each level.
set -e
cd /root/repo
N=${1:-240000}
LO=${2:-4}
HI=${3:-16}
python - << EOF
import sys
sys.path.insert(0, ".")
import bench
p = bench._ensure_corpus($N)
print("corpus:", p)
EOF
CORPUS="BENCH/cache/turns_n${N}_seed42.parquet.d"
warm() { for f in $CORPUS/*; do cat "$f" > /dev/null; done; }
for rep in 1 2; do
  warm; echo "--- rep $rep lo($LO) ---"; python tools/bench_pipeline.py $LO $CORPUS 2>/dev/null | tail -1
  warm; echo "--- rep $rep hi($HI) ---"; python tools/bench_pipeline.py $HI $CORPUS 2>/dev/null | tail -1
done
