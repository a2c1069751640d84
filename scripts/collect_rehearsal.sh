#!/bin/bash
# Snapshot a dress-rehearsal run's artifact set into the repo for the
# judge: the 7 reference log files + cfg + dated summary + fps.
#   bash scripts/collect_rehearsal.sh RUN_DIR scripts/rehearsal_r4
set -e
SRC=${1:?run dir}
DST=${2:?dest dir}
mkdir -p "$DST"
for f in trainFile trainaccFile trainepochFile valFile valaccFile \
         testFile testaccFile lrFile fpsfile; do
  [ -f "$SRC/$f.txt" ] && cp "$SRC/$f.txt" "$DST/"
done
cp "$SRC/../cfg.json" "$DST/" 2>/dev/null || cp "$SRC/cfg.json" "$DST/" 2>/dev/null || true
SUM=$(ls -t "$SRC"/2*_*.txt 2>/dev/null | head -1)
[ -n "$SUM" ] && cp "$SUM" "$DST/summary.txt"
echo "collected into $DST:"
wc -l "$DST"/*.txt | tail -3
