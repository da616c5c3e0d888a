#!/bin/sh
# Proxy-seam probe: consumes stdin, echoes the proxy environment the
# adapter exported (one line, pipe-separated).
cat > /dev/null
printf '%s|%s|%s' "$GRAFT_PROXIES" "$http_proxy" "$https_proxy"
