#!/bin/bash
# Real-scale data dress rehearsal (VERDICT r2 #6).
#
# Runs the reference's actual training protocol — 5,985 patches, fold 2/5,
# 70 epochs, batch 4, Adam 1e-4, StepLR(5, 0.9), MMVit4
# (F8_IMAGES4.py:11-95 + the committed run artifacts) — on TPU through the
# CLI, with the data flowing through the REAL ingestion path:
# .mat files -> native C++ MAT reader -> .npz pack -> padded batcher.
# The .mat set is synthetic-but-DSTL-shaped (scripts/make_dstl_scale_set.py;
# the DSTL files are not on this box). Records pack wall, per-epoch wall,
# and the full 7-logfile artifact set.
#
#   setsid nohup bash scripts/dress_rehearsal.sh /root/dstl_scale > /tmp/rehearsal.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):$PYTHONPATH"   # the run step cd's out of the repo
ROOT=${1:-/root/dstl_scale}
N=${2:-5985}
EPOCHS=${3:-70}
MODE=${4:-full}
DEADLINE=${5:-}   # optional: wall-clock training budget in seconds —
                  # training stops at an epoch boundary past it (resumable)
                  # and the test phase still runs (testaccFile written)
RUN="$ROOT/run_${MODE}"
mkdir -p "$RUN"

timeout 120 python -c "import jax; print(jax.devices())" || exit 1
make -C native -q || make -C native

# 1. pack the .mat set through the native reader (timed — this is the
#    reference's disk hot spot, ~3x trainSetSize scipy loads per run)
if [ ! -f "$ROOT/pack.npz" ]; then
  python - "$ROOT" "$N" <<'EOF'
import resource, sys, time
from corrifnet_tpu.data.dstl import pack_mat_directory
from corrifnet_tpu.data.native import native_available
root, n = sys.argv[1], int(sys.argv[2])
assert native_available(), "native MAT reader must be built for the rehearsal"
t = time.time()
pack_mat_directory(f"{root}/RGBs", f"{root}/all20Ch", f"{root}/class06_mats",
                   f"{root}/pack.npz", n)
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
print(f"packed {n} patches in {time.time()-t:.1f}s (native reader), peak RSS {rss:.0f} MB")
EOF
fi
ls -la "$ROOT/pack.npz"

# 2. reference protocol config + permutation
python - "$RUN" "$ROOT" "$N" "$EPOCHS" "$MODE" <<'EOF'
import json, sys
run, root, n, epochs, mode = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
import os
cfg = dict(train_set_size=n, fno=2, fsiz=5, mini_batch_size=4,
           n_epochs=epochs, learn_rate=1e-4, optimizer_type="Adam",
           step_size=5, gamma=0.9, modeltype="MMVit4",
           depth_mode=mode, data_pack=f"{root}/pack.npz", seed=0,
           extended_checkpoints=True,
           # bit-identical memory lever (tests/test_decoder_modes.py):
           # lets the device-resident dataset coexist with the full-depth
           # backward (REHEARSAL_DREMAT=1 + CORRIFNET_DEVICE_DATA=1)
           decoder_remat=os.environ.get("REHEARSAL_DREMAT", "0") == "1")
json.dump(cfg, open(f"{run}/cfg.json", "w"))
from corrifnet_tpu.data.crossval import write_permutation
write_permutation(n, run, seed=0)
EOF

# 3. the run (epoch walls land in trainepochFile.txt; loss/J curves in the
#    7 logfiles; per-epoch checkpoints + val-by-restore as in the reference).
#    A prior interrupted run in this root is RESUMED from its state0
#    extended checkpoint (run.main --resume) instead of restarted.
cd "$RUN"
T0=$SECONDS
DL=()
if [ -n "$DEADLINE" ]; then DL=(--train-deadline-s "$DEADLINE"); fi
PREV=$(ls -dt ./*model0 2>/dev/null | head -1)
if [ -n "$PREV" ] && { ls "$PREV"/state0@* >/dev/null 2>&1 || [ -d "$PREV/state0" ]; }; then
  python -m corrifnet_tpu.run.main --config cfg.json --run-root . \
      --resume "$PREV" "${DL[@]}" 2>&1 | tail -40
else
  python -m corrifnet_tpu.run.main --config cfg.json --run-root . \
      "${DL[@]}" 2>&1 | tail -40
fi
echo "run wall: $((SECONDS - T0)) s"
