#!/bin/bash
# TPU-tunnel recovery watcher (dev tooling for the tunneled single-chip
# environment; see CLAUDE.md "ONE TPU process at a time").
#
# A downed/wedged axon backend makes every `jax.devices()` block and
# fail UNAVAILABLE after a ~25-40 min internal retry window. This loop
# keeps exactly ONE patient probe at a time (never SIGKILL a TPU
# client!) and touches $OK_FILE on success, after which serial TPU work
# can resume.
#
# Usage: nohup scripts/tpu_watch.sh &            # watch in background
#        ls /tmp/tpu_ok                          # recovery marker

OK_FILE=${OK_FILE:-/tmp/tpu_ok}
LOG=${LOG:-/tmp/tpu_watch.log}

while true; do
  python -u -c "
import time, jax, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
x = jnp.ones((128, 128)); y = (x @ x).block_until_ready()
print(f'TPU OK {d} in {time.time()-t0:.0f}s', flush=True)
open('$OK_FILE', 'w').write(str(time.time()))
" >> "$LOG" 2>&1 && break
  echo "$(date +%H:%M:%S) attempt failed; retrying in 60s" >> "$LOG"
  sleep 60
done
