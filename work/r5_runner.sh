#!/bin/bash
# Round-5 serialized probe queue: consumes lines "name ENV=V ..." from
# work/r5_todo.txt (sorted; append freely), logs to work/r5.log, marks
# work/r5_done.txt.  TMO=secs in a line overrides the default timeout.
cd /root/repo
log=work/r5.log
todo=work/r5_todo.txt
done_f=work/r5_done.txt
touch "$todo" "$done_f"
while true; do
  line=$(comm -23 <(sort -u "$todo") <(sort -u "$done_f") | head -1)
  if [ -z "$line" ]; then
    sleep 30
    line=$(comm -23 <(sort -u "$todo") <(sort -u "$done_f") | head -1)
    [ -z "$line" ] && break
  fi
  name=$(echo "$line" | cut -d' ' -f1)
  envs=$(echo "$line" | cut -s -d' ' -f2-)
  tmo=3600
  case "$envs" in *TMO=*) tmo=$(echo "$envs" | sed 's/.*TMO=\([0-9]*\).*/\1/');; esac
  echo "=== $name  ($(date +%H:%M:%S))  env: $envs" >> $log
  env $envs SETTLE=20 timeout $tmo python work/probe4.py >> $log 2>&1
  echo "$line" >> "$done_f"
  # survive checkout refreshes: the log is gitignored, so snapshot it
  cp $log work/r5_log_snapshot.txt 2>/dev/null
done
echo "RUNNER IDLE-EXIT $(date +%H:%M:%S)" >> $log
cp $log work/r5_log_snapshot.txt 2>/dev/null
