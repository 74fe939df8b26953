#!/bin/bash
# Round-5 chip job runner: consumes bash job snippets from
# logs/r5_jobs/pending/ in lexical order (one TPU job at a time, per
# CLAUDE.md), so priorities can be re-ordered mid-round by renaming
# files instead of editing a running script.  Launched with setsid so
# it survives session restarts.  Stop: create logs/r5_jobs/STOP (and
# kill the running job's pid from logs/r5_jobs/current_job.pid).
cd /root/repo || exit 1
QD=logs/r5_jobs
mkdir -p "$QD/pending" "$QD/running" "$QD/done"
while true; do
  job=$(ls "$QD/pending" 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    if [ -f "$QD/STOP" ]; then break; fi
    sleep 60
    continue
  fi
  mv "$QD/pending/$job" "$QD/running/$job"
  echo "[$(date -u +%H:%M:%S)] start $job"
  bash "$QD/running/$job" &
  echo $! > "$QD/current_job.pid"
  wait $!
  rc=$?
  echo "[$(date -u +%H:%M:%S)] done $job rc=$rc"
  mv "$QD/running/$job" "$QD/done/${job}.rc${rc}"
done
echo RUNNER_DONE
