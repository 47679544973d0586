#!/bin/bash
# Round-2 series B (capacity) -- direct run, no wait.
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
run() {
  name=$1; shift
  echo "== $name: $*" >> $LOG
  env "$@" timeout 3000 $PY work/probe3.py >> $LOG 2>&1
  echo >> $LOG
}
BASE="PPM_EXCL=1 CMIX_PPM_ORDERS=1,2,3,4,5,6,8,10,12,16,20,24 PPM_UPD=1 CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,20,24 BANK_CK=1 MIX_DYN2=1 MIX_DYN3=1"
run B1-capacity $BASE TBITS=24 PBITS=24 MBITS=22 IBITS=20
run B2-sbadapt $BASE TBITS=24 PBITS=24 MBITS=22 IBITS=20 SBANK_ADAPT=1
run B3-ind8 $BASE TBITS=24 PBITS=24 MBITS=22 IBITS=20 SBANK_ADAPT=1 CMIX_N_IND=8
echo "SERIES B DONE" >> $LOG
