#!/bin/bash
cd /root/repo
P=/opt/venv/bin/python
B="TBITS=22 MBITS=20 IBITS=18 PBITS=22 PPM_EXCL=1 CMIX_MATCH_ORDERS=3,5,8,12,16,24"
echo "=== 4MB final defaults ==="
timeout 3000 $P work/regress_probe.py 4.0 /root/repo 2>/dev/null
echo "=== new-default 100k baselines ==="
env $B timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B timeout 2400 $P work/ratio_probe.py 16384 testdata/exe100k.raw 6 2>/dev/null
env $B timeout 2400 $P work/ratio_probe.py 16384 testdata/dict100k.raw 6 2>/dev/null
echo "=== candidates ==="
env $B APM2X=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B CMIX_SBANK_COLS=0,1,2,3,4,5,6,7,10,11,14,24,29,36 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B MIX_BOOST=2 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B MIX_TAU=2e5 timeout 2400 $P work/ratio_probe.py 16384 testdata/text100k.raw 6 2>/dev/null
env $B VMATCH=1 timeout 2400 $P work/ratio_probe.py 16384 testdata/dict100k.raw 6 2>/dev/null
echo "=== jpeg v3 (stride grid) ==="
timeout 3000 $P work/jpeg_probe.py 2>/dev/null
echo "=== full-pipeline CLI exe100k ==="
cd /tmp && rm -rf exechk && mkdir exechk && cd exechk
PYTHONPATH=/root/repo timeout 2400 $P -m cmix_tpu.runner c /root/repo/testdata/exe100k.raw out.tcmx --block-size 16384 --tbits 22 --max-batch 8 2>&1 | tail -2
wc -c out.tcmx 2>/dev/null
echo R3_DONE
