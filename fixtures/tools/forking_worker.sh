#!/bin/sh
# Line-protocol worker that, on a "SLEEP:<pidfile>" payload, FORKS a
# long-lived grandchild (recording the grandchild pid to <pidfile>)
# and then stalls — the fork-during-kill case: the timeout kill must
# take down the whole process GROUP, grandchild included, not just
# this shell.
while IFS= read -r line; do
  case "$line" in
    SLEEP:*)
      pidfile="${line#SLEEP:}"
      sleep 300 &
      echo $! >> "$pidfile"
      sleep 300
      ;;
  esac
  printf 'ok:%s\n' "$line"
done
