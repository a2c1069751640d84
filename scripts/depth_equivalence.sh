#!/bin/bash
# Pruned==full decoder-depth equivalence across seeds (VERDICT r2 #7).
#
# The pruned decoder is exactly equal to the reference's full-depth
# cascade for the prediction (tests/test_decoder_modes.py); the only
# training-time divergence is InstanceNorm statistics (full depth vs
# prefix — models/decoder.py docstring). Round-1's evidence was one
# 48-sample comparison; this runs BOTH modes through the training CLI on
# a medium synthetic set for >=3 seeds and records final test Jaccard +
# per-epoch curves, the evidence base for flipping the parity default to
# 'pruned' (PARITY.md entry).
#
#   bash scripts/depth_equivalence.sh [OUTROOT] [N] [EPOCHS] 2>&1 | tee /tmp/depth_eq.log
set -x
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
OUT=${1:-/tmp/depth_eq}
N=${2:-240}
EPOCHS=${3:-20}
mkdir -p "$OUT"

timeout 120 python -c "import jax; print(jax.devices())" || exit 1

for SEED in 1 2 3; do
  for MODE in pruned full; do
    D="$OUT/s${SEED}_${MODE}"
    # done = a NON-EMPTY testaccFile inside a dated run dir (the logfiles
    # are created empty at run start, and they live under *model0/, not $D)
    if find "$D" -path '*model0/testaccFile.txt' -size +0c 2>/dev/null | grep -q .; then
      continue
    fi
    mkdir -p "$D"
    python - "$D" "$SEED" "$MODE" "$N" "$EPOCHS" <<'EOF'
import json, sys
d, seed, mode, n, epochs = sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
cfg = dict(train_set_size=n, n_epochs=epochs, mini_batch_size=4,
           learn_rate=1e-4, step_size=5, gamma=0.9, modeltype="MMVit4",
           depth_mode=mode, synthetic_seed=seed, seed=seed,
           extended_checkpoints=True)  # resumable across session kills
json.dump(cfg, open(f"{d}/cfg.json", "w"))
from corrifnet_tpu.data.crossval import write_permutation
write_permutation(n, d, seed=0)  # same folds for both modes of a seed
EOF
    # a prior interrupted run with an extended checkpoint resumes in place
    # (-t: newest by mtime — dated dir NAMES don't sort chronologically)
    PRIOR=$(ls -dt "$D"/*model0 2>/dev/null | head -1)
    if [ -n "$PRIOR" ] && ls "$PRIOR"/state0@* >/dev/null 2>&1; then
      (cd "$D" && timeout 4500 python -m corrifnet_tpu.run.main \
          --config cfg.json --run-root . --resume "$PRIOR" 2>&1 | tail -3) || true
    else
      rm -rf "$D"/*model0   # dead partial run without a checkpoint
      (cd "$D" && timeout 4500 python -m corrifnet_tpu.run.main \
          --config cfg.json --run-root . 2>&1 | tail -3) || true
    fi
  done
done

python - "$OUT" <<'EOF'
import sys, glob, os
out = sys.argv[1]
print(f"\n{'seed':>4} {'mode':>7} {'test_J':>9} {'val_J@last':>10}")
for d in sorted(glob.glob(os.path.join(out, 's*_*'))):
    seed, mode = os.path.basename(d).split('_', 1)
    runs = sorted(glob.glob(os.path.join(d, '*model0')))  # dated run dir
    try:
        tj = open(os.path.join(runs[-1], 'testaccFile.txt')).read().split()[0]
        vj = open(os.path.join(runs[-1], 'valaccFile.txt')).read().split()[-1]
        print(f"{seed:>4} {mode:>7} {float(tj):9.5f} {float(vj):10.5f}")
    except Exception as e:
        print(f"{seed:>4} {mode:>7}  MISSING ({type(e).__name__})")
EOF
