#!/bin/bash
# Final-candidate combos at the winning bits (22/20/18/22) + excl + match6.
cd /root/repo
P=/opt/venv/bin/python
B="TBITS=22 MBITS=20 IBITS=18 PBITS=22 PPM_EXCL=1 CMIX_MATCH_ORDERS=3,5,8,12,16,24"
for f in testdata/text100k.raw testdata/dict100k.raw; do
  env $B VMATCH=1 timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  env $B MIX_AUX=1 timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  env $B MIX_DYN2=1 timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  env $B MIX_AUX=1 MIX_DYN2=1 timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
done
env $B MIX_AUX=1 MIX_DYN2=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/exe100k.raw 6 2>/dev/null
