#!/bin/bash
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
run /tmp/check_decode.log 2400 python -m bench.check_decode
run /tmp/bench_decode.log 2400 python bench/bench_decode.py
run /tmp/exp_kvq_long.log 4800 python -m bench.exp_kvq_long
run /tmp/exp_dot_fp32.log 2400 python -m bench.exp_dot_shapes --fp32
run runs/mt_deen_train.log 3600 python -m tpu_flash.apps.machine_translation \
    --dataset local --n-vocab 4000 --lr 0.003 --n-epochs 20 \
    --dtype bfloat16 --workdir runs/mt_deen
