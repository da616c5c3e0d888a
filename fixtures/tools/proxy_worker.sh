#!/bin/sh
# Line-protocol worker that answers every record with the http_proxy
# it was spawned with — and stalls on "SLEEP" so a timeout kill can
# force a respawn. Lets the spec observe which proxy each worker
# GENERATION saw (the respawn-advance path of the rotation).
while IFS= read -r line; do
  case "$line" in
    *SLEEP*) sleep 30 ;;
  esac
  printf '%s\n' "$http_proxy"
done
