#!/bin/bash
# model-shape sweep on the real chip: LSTM horizon/hidden, match orders,
# PPM order ablation, dict100k coverage.  Runs at the current best table
# bits (filled in from sweep_bits results).
cd /root/repo
P=/opt/venv/bin/python
TB=${TB:-20}; MB=${MB:-18}; IB=${IB:-16}; PB=${PB:-20}
for f in testdata/text100k.raw testdata/dict100k.raw; do
  # A. baseline at these bits (shallow 7-order PPM default)
  TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # B. deep 10-order PPM for comparison
  TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB \
    CMIX_PPM_ORDERS=1,2,3,4,6,8,12,16,20,24 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # C. LSTM horizon 16
  TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB LSTM_W=16 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # D. LSTM horizon 24
  TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB LSTM_W=24 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # E. six match orders
  TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB CMIX_MATCH_ORDERS=3,5,8,12,16,24 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # F. wider state bank (18 models)
  TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB \
    CMIX_SBANK_COLS=0,1,2,3,4,5,7,8,10,11,14,16,23,24,29,36,40,25 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # G. tbits 22
  TBITS=22 MBITS=$MB IBITS=$IB PBITS=$PB \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # H. adaptive per-row mixer LR warmup
  TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB MIX_BOOST=3 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB MIX_BOOST=8 MIX_BOOST_N=64 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
  # I. single indirect (pre-expansion baseline)
  TBITS=$TB MBITS=$MB IBITS=$IB PBITS=$PB CMIX_N_IND=1 \
    timeout 2400 $P work/ratio_probe.py 16384 $f 6 2>/dev/null
done
