#!/bin/bash
# Rerun of the dark-feature probes (chain-1 runs crashed on the interim
# Pallas lowering bug), plus the on-chip Pallas microbench and the
# 6-context JPEGX measure.
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r3_chain3.log
while ! grep -q "R3 CHAIN2 DONE" work/r3_chain2.log 2>/dev/null; do sleep 60; done
date >> $LOG
echo "== PALLAS-BENCH" >> $LOG
timeout 1200 $PY work/pallas_bench.py >> $LOG 2>&1
echo "== JPEGX6 grace_hopper" >> $LOG
timeout 2400 $PY work/jpegx_probe.py >> $LOG 2>&1
p3() {
    echo "== $1: $2" >> $LOG
    env $2 timeout 2000 $PY work/probe3.py >> $LOG 2>&1
}
p3 R3-stemx "STEMX=1"
p3 R3-wmatch "CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,24,100,101"
p3 R3-match2 "MATCH2=1"
p3 R3-apm3x "APM3X=1"
p3 R3-dyn4 "MIX_DYN4=1"
p3 R3-bankch2 "BANK_CH=2"
p3 R3-combo "STEMX=1 MATCH2=1 APM3X=1 MIX_DYN4=1"
echo "R3 CHAIN3 DONE" >> $LOG
