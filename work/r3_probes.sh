#!/bin/bash
# Round-3 probe chain (serialized: one TPU client at a time).
# 1. op census  2. JPEGX (4-ctx) on grace_hopper  3. natural-media gates
# 4. dark-feature probes on the 100KB parity files.
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r3_probes.log
date >> $LOG

echo "== OPPROF (post-r3-fix op census)" >> $LOG
timeout 900 $PY work/opprof.py >> $LOG 2>&1

echo "== JPEGX4 grace_hopper" >> $LOG
timeout 2400 $PY work/jpegx_probe.py >> $LOG 2>&1

echo "== MEDIA natural corpus" >> $LOG
timeout 2400 $PY work/media3_probe.py >> $LOG 2>&1

p3() {
    echo "== $1: $2" >> $LOG
    env $2 timeout 2000 $PY work/probe3.py >> $LOG 2>&1
}
p3 R3-stemx "STEMX=1"
p3 R3-wmatch "CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,24,100,101"
p3 R3-apm3x "APM3X=1"
p3 R3-dyn4 "MIX_DYN4=1"
p3 R3-bankch2 "BANK_CH=2"
p3 R3-combo "STEMX=1 CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,24,100,101 APM3X=1 MIX_DYN4=1"
echo "R3 PROBES DONE" >> $LOG
