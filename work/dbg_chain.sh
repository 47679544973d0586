#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
# wait for the jpegx probe to release the device
while pgrep -f jpegx_probe.py > /dev/null; do sleep 30; done
echo "== DBG-2M (blk=256K tbits=22 dict)" >> $LOG
timeout 3000 $PY work/scale_debug.py 2 >> $LOG 2>&1
echo "== DBG-8M" >> $LOG
timeout 4000 $PY work/scale_debug.py 8 >> $LOG 2>&1
echo "DBG DONE" >> $LOG
