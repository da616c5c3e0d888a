#!/bin/sh
# Per-record tool: reads the WHOLE payload from stdin (like pdftotext
# reading one file), stalls on "SLEEP" payloads, else uppercases.
IN=$(cat)
case "$IN" in
  *SLEEP*) sleep 30 ;;
esac
printf '%s' "$IN" | tr 'a-z' 'A-Z'
