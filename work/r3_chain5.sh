#!/bin/bash
# Post-headline chip work: clean bench, RUNX probe.
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r3_chain5.log
while ! grep -q "roundtrip=" work/r3_headline.log 2>/dev/null; do sleep 120; done
date >> $LOG
echo "== BENCH clean (new defaults)" >> $LOG
timeout 900 $PY bench.py >> $LOG 2>&1
echo "== RUNX probe" >> $LOG
env RUNX=1 timeout 2000 $PY work/probe3.py >> $LOG 2>&1
echo "== RUNX+defaults text only rerun for stability" >> $LOG
timeout 2000 $PY work/probe3.py >> $LOG 2>&1
echo "R3 CHAIN5 DONE" >> $LOG
