#!/bin/bash
# Round-5 chip session, part 3: target retrain for the speculative demo
# (the round-4 runs/mt_deen checkpoints were never committed — only
# metrics.jsonl is in git), then the trained-draft speculative serving
# demonstration, then the compositional quant table.  Waits on the
# in-flight bench_serving job (PID $1).
cd /root/repo || exit 1
D=runs/r5_chiplogs
S=$D/session_status.log

job() {
  local name=$1 cap=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) start $name (cap ${cap}s): $*" >> "$S"
  stdbuf -oL timeout "$cap" "$@" > "$D/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" >> "$S"
  return $rc
}

while [ -n "$1" ] && kill -0 "$1" 2>/dev/null; do sleep 15; done
echo "=== $(date -u +%H:%M:%S) SESSION3 START" >> "$S"

# target retrain: same config family as round-4's mt_deen (local corpus,
# n_vocab 4000 -> identical BPE tokenizer as runs/mt_draft), 12 epochs
# is deep into convergence on this corpus (r4 epoch-12 train loss ~1e-3)
job mt_target 2400 python -m tpu_flash.apps.machine_translation \
    --dataset local --n-vocab 4000 --lr 0.003 --n-epochs 12 \
    --attention-kind auto --workdir runs/mt_deen_r5 --skip-bleu

# trained-draft speculative serving (VERDICT #4)
job bench_spec_mt 2400 python bench/bench_spec_mt.py --target runs/mt_deen_r5

# compositional-split MT quant table (VERDICT #5)
for kv in none int8 fp8 int8_channel; do
  job mt_comp5_$kv 1800 python -m tpu_flash.apps.machine_translation \
      --dataset local-comp --n-vocab 4000 --lr 0.003 --attention-kind auto \
      --n-epochs 5 --workdir runs/mt_comp5_$kv --kv-quant-train $kv
done

# clock permitting: qw/wq interleave rerun, then the 30-epoch table
job exp_kv_channel2 2700 python -m bench.exp_kv_channel
for kv in none int8 fp8 int8_channel; do
  job mt_comp30_$kv 3600 python -m tpu_flash.apps.machine_translation \
      --dataset local-comp --n-vocab 4000 --lr 0.003 --attention-kind auto \
      --n-epochs 30 --workdir runs/mt_comp30_$kv --kv-quant-train $kv
done
echo "=== $(date -u +%H:%M:%S) SESSION3 END" >> "$S"
