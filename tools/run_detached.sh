#!/bin/bash
# Detached TPU-run wrapper: survives the caller; writes rc to the log.
# Usage: run_detached.sh LOGFILE DELAY_S MAX_S CMD...
log="$1"; delay="$2"; max="$3"; shift 3
setsid bash -c "sleep $delay; stdbuf -oL timeout $max \"\$@\" > $log 2>&1; echo \"rc=\$?\" >> $log" _ "$@" < /dev/null > /dev/null 2>&1 &
echo "detached pid $!"
