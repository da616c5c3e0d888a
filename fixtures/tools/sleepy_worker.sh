#!/bin/sh
# Line-protocol worker that stalls (sleep 30) on the literal payload
# "SLEEP" — the poisoned-file case the per-record timeout must kill.
while IFS= read -r line; do
  case "$line" in
    *SLEEP*) sleep 30 ;;
  esac
  printf 'ok:%s\n' "$line"
done
