#!/bin/bash
# Post-rehearsal device-residency probe (VERDICT r5 items 2/5): a SHORT
# deadline run of the reference protocol measuring epoch wall + test-phase
# FPS with the dataset resident in HBM.
#
#   bash scripts/residency_probe.sh /root/dstl_scale 5985 [BUDGET_GB]
#
# Tries FULL-set residency first (6.31 GB wire-cast + the lean B=4 step
# peak 5.16 GB — NOTES r5 ladder says ~11.5 of ~12 usable: marginal, the
# point of the probe); a RESOURCE_EXHAUSTED run falls back to the default
# budget (val+test folds). Artifacts land in $ROOT/run_resid/.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):$PYTHONPATH"
ROOT=${1:-/root/dstl_scale}
N=${2:-5985}
BUDGET=${3:-7}
DEADLINE=${4:-700}
RUN="$ROOT/run_resid"
rm -rf "$RUN"; mkdir -p "$RUN"

timeout 120 python -c "import jax; print(jax.devices())" || exit 1

python - "$RUN" "$ROOT" "$N" <<'EOF'
import json, sys
run, root, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
cfg = dict(train_set_size=n, fno=2, fsiz=5, mini_batch_size=4,
           n_epochs=70, learn_rate=1e-4, optimizer_type="Adam",
           step_size=5, gamma=0.9, modeltype="MMVit4",
           depth_mode="full", data_pack=f"{root}/pack.npz", seed=0,
           extended_checkpoints=False)
json.dump(cfg, open(f"{run}/cfg.json", "w"))
from corrifnet_tpu.data.crossval import write_permutation
write_permutation(n, run, seed=0)
EOF

cd "$RUN"
T0=$SECONDS
# NOTE: no `| tail` on the probed leg — a pipe would mask run.main's exit
# status (the r5 full-set probe OOM'd but the fallback never fired because
# tail exited 0)
if ! CORRIFNET_DEVICE_DATA_BUDGET_GB="$BUDGET" \
    python -m corrifnet_tpu.run.main --config cfg.json --run-root . \
      --train-deadline-s "$DEADLINE" > probe_full.log 2>&1; then
  tail -25 probe_full.log
  echo "=== full-set residency leg failed; retrying with default budget ==="
  python -m corrifnet_tpu.run.main --config cfg.json --run-root . \
      --train-deadline-s "$DEADLINE" 2>&1 | tail -25
fi
echo "probe wall: $((SECONDS - T0)) s"
D=$(ls -dt ./*model0 | head -1)
echo "epochs logged:"; wc -l < "$D/trainepochFile.txt" 2>/dev/null
echo "test fps:"; cat "$D/fpsfile.txt" 2>/dev/null
