#!/bin/sh
# Line-protocol worker for ExternalToolSpec: echoes "<pid> <UPPERCASED>"
# per input line. Long-lived — exits only when stdin closes, so the
# pid proves per-partition process reuse.
while IFS= read -r line; do
  up=$(printf '%s' "$line" | tr 'a-z' 'A-Z')
  printf '%s %s\n' "$$" "$up"
done
