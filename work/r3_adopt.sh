#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r3_adopt.log
date >> $LOG
p3() {
    echo "== $1: $2" >> $LOG
    env $2 timeout 2500 $PY work/probe3.py >> $LOG 2>&1
}
p3 R5-newdefaults ""
p3 R5-bankch2 "BANK_CH=2"
echo "R5 ADOPT DONE" >> $LOG
