#!/bin/bash
# Round-2 ratio campaign, series A: layered feature probes.
# Reference bars: text 0.642 | exe 1.567 | dict 2.148.
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
run() {
  name=$1; shift
  echo "== $name: $*" >> $LOG
  env "$@" timeout 3000 $PY work/probe3.py >> $LOG 2>&1
  echo >> $LOG
}
M6=CMIX_MATCH_ORDERS=3,5,8,12,16,24
PD=CMIX_PPM_ORDERS=1,2,3,4,5,6,8,10,12,16,20,24
MW=CMIX_MATCH_ORDERS=1,2,3,5,8,12,16,20,24

run P0-r1best PPM_EXCL=1 $M6
run P1-ppmdeep PPM_EXCL=1 $M6 $PD PPM_UPD=1
run P2-matchwide PPM_EXCL=1 $PD PPM_UPD=1 $MW
run P3-bankck PPM_EXCL=1 $PD PPM_UPD=1 $MW BANK_CK=1
run P4-gates PPM_EXCL=1 $PD PPM_UPD=1 $MW BANK_CK=1 MIX_DYN2=1 MIX_DYN3=1
run P5-channels PPM_EXCL=1 $PD PPM_UPD=1 $MW BANK_CK=1 MIX_DYN2=1 MIX_DYN3=1 BANK_CH=3 MIX_AUX=1
run P6-apm2x PPM_EXCL=1 $PD PPM_UPD=1 $MW BANK_CK=1 MIX_DYN2=1 MIX_DYN3=1 BANK_CH=3 MIX_AUX=1 APM2X=1
echo "SERIES A DONE" >> $LOG
