#!/bin/bash
# Gate sweep under the normalized final blend (all prior numbers stale).
cd /root/repo
P=/opt/venv/bin/python
B="TBITS=22 MBITS=20 IBITS=18 PBITS=22 PPM_EXCL=1 CMIX_MATCH_ORDERS=3,5,8,12,16,24"
run() { env $B "$@" timeout 2400 $P work/ratio_probe.py 16384 "$2" 6 2>/dev/null; }
env $B timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B BANK_CH=2 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B BANK_CH=3 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B MIX_AUX=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B MIX_DYN2=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B WIKI=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B MIX_KIND=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B VMATCH=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B BANK_CH=2 MIX_AUX=1 MIX_DYN2=1 WIKI=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B timeout 2400 $P work/ratio_probe.py 16384 testdata/dict100k.raw 6 2>/dev/null
env $B BANK_CH=2 MIX_AUX=1 MIX_DYN2=1 WIKI=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/dict100k.raw 6 2>/dev/null
env $B timeout 2400 $P work/ratio_probe.py 16384 testdata/exe100k.raw 6 2>/dev/null
env $B BANK_CH=2 MIX_AUX=1 MIX_DYN2=1 LMS=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/exe100k.raw 6 2>/dev/null
echo SWEEP_DONE
