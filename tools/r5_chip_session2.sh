#!/bin/bash
# Round-5 chip session, part 2: waits for the part-1 job still on the
# chip (exp_fp32_floor) to exit, then runs the remaining jobs in
# budget-priority order.  The two-head packing probes rerun with the
# GRID fix (the part-1 run's per-call work was inside tunnel noise);
# check_fa and the 30-epoch comp tables are dropped for the clock.
cd /root/repo || exit 1
D=runs/r5_chiplogs
S=$D/session_status.log

job() {  # job <name> <timeout_s> <cmd...>
  local name=$1 cap=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) start $name (cap ${cap}s): $*" >> "$S"
  stdbuf -oL timeout "$cap" "$@" > "$D/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" >> "$S"
  return $rc
}

# wait for the part-1 straggler (PID passed as $1) to release the chip
while [ -n "$1" ] && kill -0 "$1" 2>/dev/null; do
  sleep 20
done
echo "=== $(date -u +%H:%M:%S) SESSION2 START" >> "$S"

# fixed packing probes (VERDICT #3)
job exp_pack_bf16_f 1500 python -m bench.exp_two_head_pack
job exp_pack_fp32_f 1500 python -m bench.exp_two_head_pack --fp32

# draft training then speculative serving (VERDICT #4)
job mt_draft 2400 python -m tpu_flash.apps.machine_translation \
    --dataset local --model-max-length 40 --n-vocab 4000 --n-embd 128 \
    --n-head 4 --n-layer 2 --n-epochs 12 --lr 0.003 \
    --attention-kind auto --workdir runs/mt_draft --skip-bleu
job bench_spec_mt 2400 python bench/bench_spec_mt.py

# serving trace with phase attribution (VERDICT #7)
job bench_serving 2700 python bench/bench_serving.py

# compositional-split MT quant table (VERDICT #5), 5-epoch four-way
for kv in none int8 fp8 int8_channel; do
  job mt_comp5_$kv 1800 python -m tpu_flash.apps.machine_translation \
      --dataset local-comp --n-vocab 4000 --lr 0.003 --attention-kind auto \
      --n-epochs 5 --workdir runs/mt_comp5_$kv --kv-quant-train $kv
done

# if the clock still allows: the qw/wq interleave rerun, then 30-epoch
job exp_kv_channel2 2700 python -m bench.exp_kv_channel
for kv in none int8 fp8 int8_channel; do
  job mt_comp30_$kv 3600 python -m tpu_flash.apps.machine_translation \
      --dataset local-comp --n-vocab 4000 --lr 0.003 --attention-kind auto \
      --n-epochs 30 --workdir runs/mt_comp30_$kv --kv-quant-train $kv
done

echo "=== $(date -u +%H:%M:%S) SESSION2 END" >> "$S"
