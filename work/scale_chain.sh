#!/bin/bash
# Scale run (waits for series E): 50 MiB corpus, 256K blocks, dict auto.
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
while ! grep -q "SERIES E DONE" $LOG; do sleep 60; done
echo "== SCALE-50M (blk=256K, maxb=256, tbits=22, dict=auto, ratio gates)" >> $LOG
env DICT=auto PPM_EXCL=1 PPM_UPD=1 BANK_CK=2 MIX_DYN2=1 MIX_DYN3=1 \
    CMIX_PPM_ORDERS=1,2,3,4,5,6,8,10,12,16,20,24 \
    CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,20,24 \
    timeout 12000 $PY work/scale_run.py 50 18 256 22 >> $LOG 2>&1
echo "SCALE DONE" >> $LOG
