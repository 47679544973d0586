#!/bin/bash
# Serialized probe queue: consumes lines "name ENV=V ENV=V ..." from
# work/r4w_todo.txt (appended to while running); logs to work/r4w.log.
cd /root/repo
log=work/r4w.log
todo=work/r4w_todo.txt
done_f=work/r4w_done.txt
touch "$todo" "$done_f"
# wait for the initial queue script to finish (it holds the chip)
while pgrep -f "work/r4w_queue.sh" > /dev/null 2>&1; do sleep 20; done
while true; do
  line=$(comm -23 <(sort -u "$todo") <(sort -u "$done_f") | head -1)
  if [ -z "$line" ]; then
    sleep 30
    line=$(comm -23 <(sort -u "$todo") <(sort -u "$done_f") | head -1)
    [ -z "$line" ] && break
  fi
  name=$(echo "$line" | cut -d' ' -f1)
  envs=$(echo "$line" | cut -s -d' ' -f2-)
  echo "=== $name  ($(date +%H:%M:%S))  env: $envs" >> $log
  env $envs SETTLE=30 timeout 3000 python work/probe4.py >> $log 2>&1
  echo "$line" >> "$done_f"
done
echo "RUNNER IDLE-EXIT $(date +%H:%M:%S)" >> $log
