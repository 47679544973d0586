#!/bin/bash
# Throughput shape: trade steps for batch (wall = steps x step(B)).
cd /root/repo
P=/opt/venv/bin/python
R() { echo "=== $1 ==="; shift; env PROBE_HOT=1 "$@" timeout 3000 $P work/regress_probe.py 4.0 /root/repo 2>/dev/null; }
R "bs=16384 B=256 (bench)" 
R "bs=8192 B=512" BLKSZ=8192
R "bs=4096 B=1024" BLKSZ=4096
R "bs=8192 B=512 seg=4096" BLKSZ=8192 SEGSZ=4096
R "bs=16384 B=256 seg=4096" SEGSZ=4096
echo SHAPE_DONE
