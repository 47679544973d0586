#!/bin/bash
# Component-cost ablation: hot (cache-compiled) encode time of 1MB at
# bench config with one component disabled per run.
cd /root/repo
P=/opt/venv/bin/python
R() { echo "=== $1 ==="; shift; env PROBE_HOT=1 "$@" timeout 3000 $P work/regress_probe.py 1.0 /root/repo 2>/dev/null; }
R baseline
R no-lstm LSTM_H=0
R lstm-h1 LSTM_WIN=1
R no-dmc DMC_N=0
R ppm-1order CMIX_PPM_ORDERS=2
R match-2 CMIX_MATCH_ORDERS=8,20
R sbank-4 CMIX_SBANK_COLS=0,1,2,3
R ind-1 CMIX_N_IND=1
echo SPEED_DONE
