#!/bin/bash
# Sequential chip runs with one retry per stage; lease-recovery sleeps.
cd /root/repo
run() {
  local log="$1" cap="$2"; shift 2
  for attempt in 1 2; do
    echo "=== $(date +%H:%M:%S) start($attempt): $*" >> /tmp/chain_status.log
    stdbuf -oL timeout "$cap" "$@" > "$log.$attempt" 2>&1
    local rc=$?
    echo "rc=$rc" >> "$log.$attempt"
    echo "=== $(date +%H:%M:%S) done($attempt) rc=$rc: $*" >> /tmp/chain_status.log
    cp "$log.$attempt" "$log"
    if [ $rc -eq 0 ]; then return 0; fi
    sleep 600
  done
}
run /tmp/check_fa.log 2400 python -m bench.check_fa
run /tmp/check_decode.log 2400 python -m bench.check_decode
run /tmp/exp_fw_residual.log 4800 python -m bench.exp_fw_residual
run /tmp/bench_main.log 3600 python bench.py
