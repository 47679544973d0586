#!/bin/bash
# Round-2 series C: media routing probe + small-table BANK_CK + bench
# config probe at best-known gates.  Waits for series B.
cd /root/repo
PY=/opt/venv/bin/python
LOG=work/r2_probes.log
while ! grep -q "SERIES B DONE" $LOG; do sleep 60; done
run() {
  name=$1; script=$2; shift 2
  echo "== $name: $*" >> $LOG
  env "$@" timeout 3000 $PY $script >> $LOG 2>&1
  echo >> $LOG
}
# media: off vs kind-routed models
run C1-media-off work/media_probe.py PLACEHOLDER=0
run C2-media-on work/media_probe.py LMS=2 GRID2=1 MIX_KIND=1
# BANK_CK at the small-table bench config (aliasing regime)
run C3-ck-small work/probe3.py TBITS=18 PBITS=20 MBITS=18 IBITS=16
run C4-ck-small-on work/probe3.py TBITS=18 PBITS=20 MBITS=18 IBITS=16 BANK_CK=1
echo "SERIES C DONE" >> $LOG
