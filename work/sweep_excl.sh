#!/bin/bash
# Follow-up: PPM exclusion, exclusion x deep orders, LR retune, and the
# candidate final config, on text100k + dict100k + exe100k.
cd /root/repo
P=/opt/venv/bin/python
TB=${TB:-20}; MB=${MB:-20}; IB=${IB:-18}; PB=${PB:-22}
B="TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB"
for f in testdata/text100k.raw testdata/dict100k.raw testdata/exe100k.raw; do
  # 0. new baseline (line-grid contexts, no exclusion)
  env $B timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # 1. exclusion on (shallow orders)
  env $B PPM_EXCL=1 timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # 2. exclusion + deep orders
  env $B PPM_EXCL=1 CMIX_PPM_ORDERS=1,2,3,4,6,8,12,16,20,24 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # 3. candidate final: excl + match6
  env $B PPM_EXCL=1 CMIX_MATCH_ORDERS=3,5,8,12,16,24 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
done
# capacity ceiling probe
env TBITS=24 MBITS=$MB IBITS=$IB PBITS=$PB \
  timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 \
  2>/dev/null
# LR retune at candidate config, text only
for lr in 0.003 0.005 0.006; do
  env $B PPM_EXCL=1 CMIX_MATCH_ORDERS=3,5,8,12,16,24 MIX_LR=$lr \
    timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 \
    2>/dev/null
done
