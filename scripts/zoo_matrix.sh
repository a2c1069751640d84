#!/bin/bash
# Full-zoo TPU trainability matrix: every registered model trained 10
# epochs end-to-end through the training CLI (corrifnet_tpu.run.main) on
# synthetic data, sequentially (one TPU attach, one CPU core).
#
# Usage: bash scripts/zoo_matrix.sh /tmp/zoo_runs
# Writes per-model run dirs + zoo_matrix.tsv (model, test jaccard, fps,
# wall seconds). MMVit4 runs FIRST and LAST: the repeat measures the
# persistent-compile-cache warm-start (VERDICT item 6).
set -u
ROOT=${1:-/tmp/zoo_runs}
REPO=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$ROOT"
cd "$ROOT"

python - <<'EOF'
import numpy as np
open('randInd16.txt','w').write('\n'.join(map(str, np.random.default_rng(0).permutation(16))))
EOF

MODELS=${MODELS_OVERRIDE:-"MMVit4 MMVit2 mmformer RFNet RobustMseg MultiSenseSeg UNetV2 DeepLabv3_plus Segformer FASSDNet ENet ELANet MMVit4"}
: > zoo_matrix.tsv
i=0
for M in $MODELS; do
  i=$((i+1))
  TAG="${i}_${M}"
  mkdir -p "$TAG"; cp randInd16.txt "$TAG/"
  printf '%s\n' 16 1 4 0.1 4 10 0.0003 Adam BCEWithLogitsLoss \
    BCEWithLogitsLoss Jaccard kaiming_normal_ 5 0.9 224 "$M" 0 notr \
    > "$TAG/model0.txt"
  T0=$(date +%s)
  ( cd "$TAG" && env PYTHONPATH="$REPO:${PYTHONPATH:-}" timeout 3000 \
      python -m corrifnet_tpu.run.main --config model0.txt --run-root . \
      --synthetic-seed 0 > drive.log 2>&1 )
  RC=$?
  T1=$(date +%s)
  LINE=$(grep -o "test jaccard: [0-9.]* fps: [0-9.]*" "$TAG/drive.log" | tail -1)
  echo -e "$M\t${LINE:-FAILED rc=$RC}\twall=$((T1-T0))s" | tee -a zoo_matrix.tsv
done
