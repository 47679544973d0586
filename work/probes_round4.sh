#!/bin/bash
cd /root/repo
P=/opt/venv/bin/python
echo "=== 4MB tbits=22 (bench-candidate config) ==="
TBITS=22 MBITS=20 IBITS=18 PBITS=22 timeout 3000 $P work/regress_probe.py 4.0 /root/repo 2>/dev/null
echo "=== 4MB tbits=20 ==="
TBITS=20 MBITS=19 IBITS=17 PBITS=21 timeout 3000 $P work/regress_probe.py 4.0 /root/repo 2>/dev/null
echo R4_DONE
