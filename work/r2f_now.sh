#!/bin/bash
# Round-2 series F: 2-way bank + combos at B=1 ratio mode (waits for E).
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
run() {
  name=$1; shift
  echo "== $name: $*" >> $LOG
  env "$@" timeout 3600 $PY work/probe3.py >> $LOG 2>&1
  echo >> $LOG
}
while ! grep -q "SCALE DONE" $LOG; do sleep 60; done
echo "== BENCH-sanity (new defaults)" >> $LOG
timeout 1200 $PY bench.py >> $LOG 2>&1
echo >> $LOG
echo "== F0-jpegx-retry" >> $LOG
timeout 3000 $PY work/jpegx_probe.py >> $LOG 2>&1
echo >> $LOG
BASE="PPM_EXCL=1 CMIX_PPM_ORDERS=1,2,3,4,5,6,8,10,12,16,20,24 PPM_UPD=1 CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,20,24 MIX_DYN2=1 MIX_DYN3=1"
run F1-ck2 $BASE BANK_CK=2
run F2-ck2-dyn4 $BASE BANK_CK=2 MIX_DYN4=1
run F2b-stemx $BASE BANK_CK=2 MIX_DYN4=1 STEMX=1
run F2c-wmatch PPM_EXCL=1 CMIX_PPM_ORDERS=1,2,3,4,5,6,8,10,12,16,20,24 PPM_UPD=1 CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,24,100,101 MIX_DYN2=1 MIX_DYN3=1 BANK_CK=2 MIX_DYN4=1 STEMX=1
run F3-ck2-blk1 PPM_EXCL=1 CMIX_PPM_ORDERS=1,2,3,4,5,6,8,10,12,16,20,24 PPM_UPD=1 CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,24,100,101 MIX_DYN2=1 MIX_DYN3=1 BANK_CK=2 MIX_DYN4=1 STEMX=1 BLKSZ=102400
echo "SERIES F DONE" >> $LOG
