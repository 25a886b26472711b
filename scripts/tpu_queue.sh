#!/bin/bash
# Strictly-serial TPU measurement queue (memory/RESULTS.md pending ledger).
# ONE TPU process at a time; `timeout` sends SIGTERM so the axon client can
# release the chip grant cleanly (never SIGKILL a TPU python — it wedges the
# lease; see CLAUDE.md).  Each item logs to benchmarks/logs/<name>.log.
set -u
cd /root/repo
mkdir -p benchmarks/logs

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  timeout --signal=TERM --kill-after=120 "$tmo" "$@" \
    > "benchmarks/logs/${name}.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc; tail:"
  tail -5 "benchmarks/logs/${name}.log"
  # Give the tunnel a beat to hand the grant to the next process.
  sleep 10
}

run bench            3600 python bench.py
run bf16_ab          3600 python benchmarks/bf16_ab.py
run flatadam_ab      3600 python benchmarks/flatadam_ab.py
run sweep64          3600 python benchmarks/sweep_bench.py 64
run sweep64_bf16     3600 python benchmarks/sweep_bench.py 64 --bf16
run multireplica     3600 python examples/multireplica.py
run graft_entry      1800 python __graft_entry__.py
run autotune         5400 python benchmarks/autotune_headline.py
echo "=== queue complete ==="
