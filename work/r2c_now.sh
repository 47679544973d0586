#!/bin/bash
# Round-2 series C': packed-DMC re-baseline, single-block parity,
# capacity at v5e-feasible sizes, adaptivity, LSTM horizon.
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
run C0-dmc8-rebase PPM_EXCL=1 CMIX_MATCH_ORDERS=3,5,8,12,16,24
run C1-gates $BASE
run C2-blk1 $BASE BLKSZ=102400
run C3-capacity $BASE TBITS=23 PBITS=23 MBITS=22 IBITS=20
run C4-sbadapt $BASE TBITS=23 PBITS=23 MBITS=22 IBITS=20 SBANK_ADAPT=1
run C5-lstm32 $BASE LSTM_WIN=32
echo "SERIES C2 DONE" >> $LOG
