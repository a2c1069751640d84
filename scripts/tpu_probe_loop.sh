#!/bin/bash
# Probe the axon TPU tunnel; when it answers, run the round-2 close-out
# measurement script. Waits for any given PID (e.g. a CPU drive) to exit
# first so heavy processes never overlap on this 1-core box.
WAIT_PID="$1"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "tunnel up at $(date)" > /tmp/tunnel_up.marker
    bash scripts/r2_close_measure.sh > /tmp/r2_close.log 2>&1
    echo "measure done at $(date) rc=$?" >> /tmp/tunnel_up.marker
    exit 0
  fi
  sleep 240
done
