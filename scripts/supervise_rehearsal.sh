#!/bin/bash
# Wedge-aware supervisor for long TPU runs through the axon tunnel.
#
# The tunnel can WEDGE a long-running process mid-RPC while new
# connections work fine (CLAUDE.md; observed twice in the round-4
# rehearsal: epochs stall indefinitely, process sits at ~50% CPU).
# Because every run is resumable (extended checkpoints + run.main
# --resume, and dress_rehearsal.sh is idempotent), the cure is mechanical:
# detect the stall, kill the PID, relaunch with a recomputed budget.
#
#   setsid nohup bash scripts/supervise_rehearsal.sh STOP_TS ROOT N EPOCHS MODE \
#       > /tmp/supervisor.log 2>&1 &
#
# STOP_TS: absolute epoch-seconds at which training must stop (the
# relaunched runs get --train-deadline-s so the LAST one still runs the
# test phase and completes the artifact set).
set -u
STOP_TS=${1:?absolute epoch-seconds to stop training at}
ROOT=${2:-/root/dstl_scale}
N=${3:-5985}
EPOCHS=${4:-70}
MODE=${5:-full}
RUN="$ROOT/run_${MODE}"
LAUNCH_TS=0
log() { echo "$(date +%s) supervisor: $*"; }
while true; do
  NOW=$(date +%s)
  D=$(ls -dt "$RUN"/*model0 2>/dev/null | head -1)
  PID=$(ps aux | grep "corrifnet_tpu.run.main" | grep -v grep | awk '{print $2}' | head -1)
  if [ -z "$PID" ]; then
    # complete = the full protocol ran: EPOCHS logged epochs + a test phase.
    # (Checked regardless of STOP_TS — a run that finishes early must NOT be
    # relaunched, or the resume loop burns the chip until the deadline.)
    if [ -n "$D" ] && [ -s "$D/testaccFile.txt" ] \
        && [ "$(wc -l < "$D/trainepochFile.txt" 2>/dev/null || echo 0)" -ge "$EPOCHS" ]; then
      log "complete ($D: $(wc -l < "$D/trainepochFile.txt") epochs, testacc present)"
      exit 0
    fi
    if [ "$NOW" -ge "$STOP_TS" ] && [ -n "$D" ] && [ -s "$D/testaccFile.txt" ] \
        && [ "$(stat -c %Y "$D/testaccFile.txt")" -ge "$STOP_TS" ]; then
      log "complete at deadline ($D)"
      exit 0
    fi
    BUDGET=$(( STOP_TS - NOW - 500 )); [ "$BUDGET" -lt 1 ] && BUDGET=1
    log "launching (budget ${BUDGET}s)"
    setsid nohup bash "$(dirname "$0")/dress_rehearsal.sh" "$ROOT" "$N" "$EPOCHS" "$MODE" "$BUDGET" \
        > "/tmp/rehearsal_sup_$(date +%s).log" 2>&1 &
    LAUNCH_TS=$NOW
    sleep 240
    continue
  fi
  # stall detection: training window only, past the startup grace (load+
  # compile), and only when the tunnel itself answers (a down tunnel will
  # either recover or error the process out on its own)
  if [ "$NOW" -lt $(( STOP_TS - 120 )) ] && [ $(( NOW - LAUNCH_TS )) -gt 1500 ] && [ -n "$D" ]; then
    M=$(stat -c %Y "$D/trainepochFile.txt" 2>/dev/null || echo 0)
    if [ $(( NOW - M )) -gt 900 ] && [ $(( NOW - LAUNCH_TS )) -gt $(( NOW - M )) ]; then
      if timeout 75 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
        log "wedge detected (epoch file idle $((NOW - M))s), killing $PID"
        kill "$PID"
        sleep 20
      fi
    fi
  fi
  sleep 150
done
