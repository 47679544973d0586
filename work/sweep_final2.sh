#!/bin/bash
# Decisive probes: exe at candidate, vmatch/aux/dyn2 combos, LR retune.
cd /root/repo
P=/opt/venv/bin/python
B="TBITS=22 MBITS=20 IBITS=18 PBITS=22 PPM_EXCL=1 CMIX_MATCH_ORDERS=3,5,8,12,16,24"
# exe at candidate config
env $B timeout 2400 $P work/ratio_probe.py 16384 testdata/exe100k.raw 6 2>/dev/null
# vmatch on dict (its target domain) and text
env $B VMATCH=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/dict100k.raw 6 2>/dev/null
env $B VMATCH=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
# aux taps + extra mixer gates
env $B MIX_AUX=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B MIX_DYN2=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B MIX_AUX=1 MIX_DYN2=1 VMATCH=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B MIX_AUX=1 MIX_DYN2=1 VMATCH=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/dict100k.raw 6 2>/dev/null
env $B MIX_AUX=1 MIX_DYN2=1 VMATCH=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/exe100k.raw 6 2>/dev/null
# LR retune at full candidate
for lr in 0.003 0.005 0.006; do
  env $B MIX_AUX=1 MIX_DYN2=1 VMATCH=1 MIX_LR=$lr \
    timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
done
# capacity ceiling
env TBITS=24 MBITS=20 IBITS=18 PBITS=22 PPM_EXCL=1 CMIX_MATCH_ORDERS=3,5,8,12,16,24 \
  timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
