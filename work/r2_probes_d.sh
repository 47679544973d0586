#!/bin/bash
# Round-2 series D: TPU->CPU portability proof + bench-config check
# with the one-hot rewrites.  Waits for series C.
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
while ! grep -q "SERIES C DONE" $LOG; do sleep 60; done
echo "== D1-port-tpu-enc" >> $LOG
timeout 3000 $PY work/port_cross.py enc >> $LOG 2>&1
echo "== D1-port-cpu-dec" >> $LOG
env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu timeout 3000 \
    $PY work/port_cross.py dec >> $LOG 2>&1
echo >> $LOG
echo "== D2-bench-hot (one-hot rewrites, bench cfg)" >> $LOG
env PROBE_HOT=1 BLKSZ=16384 TBITS=18 MBITS=18 IBITS=16 SEGSZ=2048 \
    timeout 3000 $PY work/regress_probe.py 4 >> $LOG 2>&1
echo "SERIES D DONE" >> $LOG
