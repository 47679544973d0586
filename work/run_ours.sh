#!/bin/bash
# Full-CLI measurement: our tpu-cmix c/d round-trip on the test corpus,
# with preprocessing (E8/E9, WRT-if-smaller, media) — apples-to-apples
# with work/baseline_measured.json (reference `cmix -n`).
cd /root/repo
P=/opt/venv/bin/python
for f in text10k text100k exe100k dict100k; do
  in=testdata/$f.raw
  cf=work/$f.tcmx
  df=work/$f.tback
  t0=$(date +%s.%N)
  timeout 3600 $P -m cmix_tpu.runner c $in $cf > work/$f.ours_enc.log 2>&1
  t1=$(date +%s.%N)
  timeout 3600 $P -m cmix_tpu.runner d $cf $df > work/$f.ours_dec.log 2>&1
  t2=$(date +%s.%N)
  ok=$(cmp -s $in $df && echo true || echo false)
  insz=$(stat -c%s $in); outsz=$(stat -c%s $cf 2>/dev/null || echo 0)
  $P -c "print(f'$f: {$insz} -> {$outsz}  bpb={8*$outsz/$insz:.4f}  enc={$t1-$t0:.1f}s dec={$t2-$t1:.1f}s roundtrip=$ok')"
done
