#!/bin/bash
# FIFO queue of chip jobs — guarantees ONE TPU process at a time (the
# tunneled chip is leased; two clients just queue and a killed client
# orphans the lease for minutes, see CLAUDE.md).
#
# Runner:   setsid tools/chip_queue.sh /tmp/chipq < /dev/null &
# Enqueue:  echo 'LOGFILE|TIMEOUT_S|COMMAND ...' >> /tmp/chipq
# Stop:     echo 'STOP' >> /tmp/chipq
#
# Each job gets one retry after a 600 s lease-recovery sleep.
cd /root/repo || exit 1
Q="$1"; STATUS=/tmp/chipq_status.log
touch "$Q"
while true; do
  line=$(head -n1 "$Q" 2>/dev/null)
  if [ -z "$line" ]; then sleep 15; continue; fi
  sed -i '1d' "$Q"
  if [ "$line" = "STOP" ]; then echo "$(date +%H:%M:%S) STOP" >> "$STATUS"; exit 0; fi
  log="${line%%|*}"; rest="${line#*|}"; cap="${rest%%|*}"; cmd="${rest#*|}"
  for attempt in 1 2; do
    echo "=== $(date +%H:%M:%S) start($attempt) cap=${cap}s: $cmd" >> "$STATUS"
    stdbuf -oL timeout "$cap" bash -c "$cmd" > "$log.$attempt" 2>&1
    rc=$?
    echo "rc=$rc" >> "$log.$attempt"
    cp "$log.$attempt" "$log"
    echo "=== $(date +%H:%M:%S) done($attempt) rc=$rc: $cmd" >> "$STATUS"
    [ "$rc" -eq 0 ] && break
    sleep 600
  done
done
