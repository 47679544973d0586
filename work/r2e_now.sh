#!/bin/bash
# Round-2 series E: dyn4 gates + fresh speed census (waits for D2).
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
while ! grep -q "SERIES D2 DONE" $LOG; do sleep 60; done
BASE="PPM_EXCL=1 CMIX_PPM_ORDERS=1,2,3,4,5,6,8,10,12,16,20,24 PPM_UPD=1 CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,20,24 BANK_CK=1 MIX_DYN2=1 MIX_DYN3=1"
echo "== E1-dyn4: $BASE MIX_DYN4=1" >> $LOG
env $BASE MIX_DYN4=1 timeout 3000 $PY work/probe3.py >> $LOG 2>&1
echo >> $LOG
echo "== E2-dyn4-kind: $BASE MIX_DYN4=1 MIX_KIND=1 MIX_AUX=1 BANK_CH=2" >> $LOG
env $BASE MIX_DYN4=1 MIX_KIND=1 MIX_AUX=1 BANK_CH=2 timeout 3000 $PY work/probe3.py >> $LOG 2>&1
echo >> $LOG
echo "== E3-bench-hot (bench cfg, packed DMC)" >> $LOG
env PROBE_HOT=1 BLKSZ=16384 TBITS=18 MBITS=18 IBITS=16 SEGSZ=2048 timeout 3000 $PY work/regress_probe.py 4 >> $LOG 2>&1
echo >> $LOG
echo "== E4-opcensus" >> $LOG
timeout 1500 $PY work/microbench.py >> $LOG 2>&1
echo "SERIES E DONE" >> $LOG
