#!/bin/bash
# Round-2 ratio campaign, series B: capacity + adaptivity + breadth.
# Waits for series A to finish (TPU is serialized).
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
while ! grep -q "SERIES A DONE" $LOG; do sleep 60; done
run() {
  name=$1; shift
  echo "== $name: $*" >> $LOG
  env "$@" timeout 3000 $PY work/probe3.py >> $LOG 2>&1
  echo >> $LOG
}
BASE="PPM_EXCL=1 CMIX_PPM_ORDERS=1,2,3,4,5,6,8,10,12,16,20,24 PPM_UPD=1 CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,20,24 BANK_CK=1 MIX_DYN2=1 MIX_DYN3=1"

# B1: reference-class table capacity (bank 3.7 GB on-chip)
run B1-capacity $BASE TBITS=24 PBITS=24 MBITS=22 IBITS=20
# B2: count-adaptive shared statemap rates
run B2-sbadapt $BASE TBITS=24 PBITS=24 MBITS=22 IBITS=20 SBANK_ADAPT=1
# B3: more double-indirect variants
run B3-ind8 $BASE TBITS=24 PBITS=24 MBITS=22 IBITS=20 SBANK_ADAPT=1 CMIX_N_IND=8
# B4: APM2X on top
run B4-apm2x $BASE TBITS=24 PBITS=24 MBITS=22 IBITS=20 SBANK_ADAPT=1 APM2X=1
echo "SERIES B DONE" >> $LOG
