#!/bin/bash
# retry the trivial ping until the tunnel recovers (or 10 attempts)
for i in $(seq 1 10); do
  echo "=== attempt $i $(date +%H:%M:%S)"
  if timeout 600 python .scratch/tunnel_ping.py 2>&1 | grep -v WARNING; then
    echo "TUNNEL RECOVERED on attempt $i"
    exit 0
  fi
  echo "attempt $i failed/timed out"
  sleep 60
done
echo "TUNNEL STILL WEDGED after 10 attempts"
exit 1
