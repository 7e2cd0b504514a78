#!/bin/bash
# Round-5 chip session: the full measurement sequence, one TPU job at a
# time (lease policy, CLAUDE.md).  Run detached once the pool answers:
#   setsid bash tools/r5_chip_session.sh < /dev/null > /dev/null 2>&1 &
# Progress: runs/r5_chiplogs/session_status.log; per-job logs alongside.
# Ordered by round-5 priority under a ~2 h budget (VERDICT r4): the
# official bench line FIRST (the round-4 record was lost to an outage),
# then channel-scale verification + speed, then packing/fp32 probes,
# then speculative/serving, then the compositional MT tables.  Jobs
# continue on failure; failed jobs are retried selectively by the
# operator (the pool's first-attempt rc=1 flakes cost ~1 min each, but a
# blind 600 s retry sleep costs more).
cd /root/repo || exit 1
D=runs/r5_chiplogs
S=$D/session_status.log
mkdir -p "$D"

job() {  # job <name> <timeout_s> <cmd...>
  local name=$1 cap=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) start $name (cap ${cap}s): $*" >> "$S"
  stdbuf -oL timeout "$cap" "$@" > "$D/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" >> "$S"
  return $rc
}

echo "=== $(date -u +%H:%M:%S) SESSION START" >> "$S"

# 0. gate: chip answers
job health 600 python tools/tpu_health.py || {
  echo "chip gate failed; aborting session" >> "$S"; exit 1; }

# 1. the OFFICIAL driver-format line, first (VERDICT r4 #2)
job bench_main 1800 python bench.py || job bench_main_r 1800 python bench.py

# 2. verify drive: public API + channel-scale parity on the real chip
job verify_chip 1500 python bench/verify_chip.py
job verify_channel 1500 python tools/verify_channel.py || \
  job verify_channel_r 1500 python tools/verify_channel.py

# 3. channel-vs-token KV scales + interleaved qw/wq (VERDICT #1, #8)
job exp_kv_channel 2700 python -m bench.exp_kv_channel || \
  job exp_kv_channel_r 2700 python -m bench.exp_kv_channel

# 4. two-head packing probes + fp32 floor (VERDICT #3)
job exp_pack_bf16 1800 python -m bench.exp_two_head_pack
job exp_pack_fp32 1800 python -m bench.exp_two_head_pack --fp32
job exp_fp32_floor 2400 python -m bench.exp_fp32_floor

# 5. draft training then speculative serving (VERDICT #4)
job mt_draft 2400 python -m tpu_flash.apps.machine_translation \
    --dataset local --model-max-length 40 --n-vocab 4000 --n-embd 128 \
    --n-head 4 --n-layer 2 --n-epochs 12 --lr 0.003 \
    --attention-kind auto --workdir runs/mt_draft --skip-bleu
job bench_spec_mt 2400 python bench/bench_spec_mt.py

# 6. serving trace with the new phase attribution (VERDICT #7)
job bench_serving 2700 python bench/bench_serving.py

# 7. compositional-split MT quant table (VERDICT #5): 5-epoch short-budget
#    first (curves still differ), then the full 30-epoch four-way if the
#    round's clock allows
for kv in none int8 fp8 int8_channel; do
  job mt_comp5_$kv 1800 python -m tpu_flash.apps.machine_translation \
      --dataset local-comp --n-vocab 4000 --lr 0.003 --attention-kind auto \
      --n-epochs 5 --workdir runs/mt_comp5_$kv --kv-quant-train $kv
done
job check_fa 1500 python -m bench.check_fa
for kv in none int8 fp8 int8_channel; do
  job mt_comp30_$kv 3600 python -m tpu_flash.apps.machine_translation \
      --dataset local-comp --n-vocab 4000 --lr 0.003 --attention-kind auto \
      --n-epochs 30 --workdir runs/mt_comp30_$kv --kv-quant-train $kv
done

echo "=== $(date -u +%H:%M:%S) SESSION END" >> "$S"
