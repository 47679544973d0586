#!/bin/bash
# Round-4 width-series probe queue: one config per probe4 run (subprocess
# per file inside).  Results append to work/r4w.log.
cd /root/repo
log=work/r4w.log
run() {
  name="$1"; shift
  echo "=== $name  ($(date +%H:%M:%S))  env: $*" >> $log
  env "$@" timeout 3000 python work/probe4.py >> $log 2>&1
}
run W0-baseline SETTLE=30
run W1-ctx3 SETTLE=30 CTX3=1
echo "QUEUE DONE $(date +%H:%M:%S)" >> $log
