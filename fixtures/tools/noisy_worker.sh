#!/bin/sh
# Line-protocol worker that also writes a DIAGNOSTIC LINE TO STDERR
# before every answer — pins that stderr is never merged into the
# stdout protocol (a merged diagnostic would be read as some record's
# answer and shift every later pairing by one).
while IFS= read -r line; do
  echo "diag: about to process $line" >&2
  printf 'ok:%s\n' "$line"
done
