#!/bin/sh
# Pathological worker for ExternalToolSpec: stalls WITHOUT ever reading
# stdin — the poisoned-startup case. A payload larger than the OS pipe
# buffer must still hit the adapter's timeout, not hang the task.
sleep 30
