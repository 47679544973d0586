#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
echo "== DBG-A 2M blk=64K tbits=22 dict" >> $LOG
timeout 2500 $PY work/scale_debug.py 2 16 22 1 >> $LOG 2>&1
echo "== DBG-B 2M blk=256K tbits=18 dict" >> $LOG
timeout 2500 $PY work/scale_debug.py 2 18 18 1 >> $LOG 2>&1
echo "== DBG-C 2M blk=256K tbits=22 nodict" >> $LOG
timeout 2500 $PY work/scale_debug.py 2 18 22 0 >> $LOG 2>&1
echo "DBG2 DONE" >> $LOG
