#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r3_chain4.log
while ! grep -q "R3 CHAIN3 DONE" work/r3_chain3.log 2>/dev/null; do sleep 60; done
date >> $LOG
p3() {
    echo "== $1: $2" >> $LOG
    env $2 timeout 2000 $PY work/probe3.py >> $LOG 2>&1
}
p3 R4-ctx2 "CTX2=1"
p3 R4-sse2 "SSE2=1"
p3 R4-ctx2-bankch2 "CTX2=1 BANK_CH=2"
echo "R3 CHAIN4 DONE" >> $LOG
