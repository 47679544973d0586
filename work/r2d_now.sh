#!/bin/bash
# Round-2 series D': media + jpeg model routing (waits for series C2).
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
while ! grep -q "SERIES C2 DONE" $LOG; do sleep 60; done
echo "== D0-jpegx" >> $LOG
timeout 3000 $PY work/jpegx_probe.py >> $LOG 2>&1
echo >> $LOG
echo "== D1-media-off" >> $LOG
timeout 3000 $PY work/media_probe.py >> $LOG 2>&1
echo >> $LOG
echo "== D2-media-on" >> $LOG
env LMS=2 GRID2=1 MIX_KIND=1 timeout 3000 $PY work/media_probe.py >> $LOG 2>&1
echo >> $LOG
echo "SERIES D2 DONE" >> $LOG
