#!/bin/bash
P=/opt/venv/bin/python
cd /root/repo
echo "=== HEAD APM_FIXED=1 4MB ==="
APM_FIXED=1 timeout 3000 $P work/regress_probe.py 4.0 /root/repo 2>work/b7_a.err
echo "=== HEAD W_APM_LEARN=0 4MB ==="
W_APM_LEARN=0 timeout 3000 $P work/regress_probe.py 4.0 /root/repo 2>work/b7_b.err
echo "=== HEAD normalized w_apm (default) 4MB ==="
timeout 3000 $P work/regress_probe.py 4.0 /root/repo 2>work/b8_a.err
