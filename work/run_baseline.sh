#!/bin/bash
# Measure reference cmix on small corpora. Writes work/baseline_measured.json
cd /root/repo
CMIX=.ref_build/cmix
for f in text10k text100k exe100k dict100k; do
  in=testdata/$f.raw
  cf=work/$f.cmix
  df=work/$f.back
  t0=$(date +%s.%N)
  $CMIX -n $in $cf > work/$f.enc.log 2>&1
  t1=$(date +%s.%N)
  $CMIX -d $cf $df > work/$f.dec.log 2>&1
  t2=$(date +%s.%N)
  ok=$(cmp -s $in $df && echo true || echo false)
  insz=$(stat -c%s $in); outsz=$(stat -c%s $cf)
  python3 -c "import json;print(json.dumps({'file':'$f','input':$insz,'compressed':$outsz,'bpb':8*$outsz/$insz,'enc_s':$t1-$t0,'dec_s':$t2-$t1,'roundtrip':'$ok'=='true'}))" >> work/baseline_lines.jsonl
done
echo DONE
