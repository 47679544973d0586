#!/bin/bash
# Waits for the probe chain, then: TPU->CPU portability proof, 8 MiB
# scale verify, op census.
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r3_chain2.log
while ! grep -q "R3 PROBES DONE" work/r3_probes.log 2>/dev/null; do sleep 60; done
date >> $LOG
echo "== PORT-CROSS enc (TPU)" >> $LOG
timeout 3000 $PY work/port_cross.py enc >> $LOG 2>&1
echo "== PORT-CROSS dec (CPU)" >> $LOG
JAX_PLATFORMS=cpu PYTHONPATH=/root/repo timeout 3000 $PY work/port_cross.py dec >> $LOG 2>&1
echo "== SCALE 8MiB blk=256K tbits=22 dict" >> $LOG
timeout 5400 $PY work/scale_debug.py 8 18 22 1 >> $LOG 2>&1
echo "== OPPROF retry" >> $LOG
timeout 900 $PY work/opprof.py >> $LOG 2>&1
echo "R3 CHAIN2 DONE" >> $LOG
