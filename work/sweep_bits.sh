#!/bin/bash
# table-bits sweep on the real chip, text100k + exe100k
cd /root/repo
P=/opt/venv/bin/python
for cfgs in "18 18 16 20" "20 18 16 20" "20 20 16 20" "20 18 18 20" "20 18 16 22" "20 20 18 22"; do
  set -- $cfgs
  for f in testdata/text100k.raw testdata/exe100k.raw; do
    TBITS=$1 MBITS=$2 IBITS=$3 PBITS=$4 timeout 1200 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  done
done
