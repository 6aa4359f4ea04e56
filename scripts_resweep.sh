#!/bin/bash
# re-run the crashed/new problems one process each (crash isolation);
# ordered smallest-first; generous per-problem timeout
cd /root/repo
for name in GREENBEA GREENBEB D2Q06C WOODW D6CUBE WOOD1P PILOT STANDGUB CRE-C CRE-A KEN-07 PILOT87 PDS-02 FIT2P DFL001 PDS-06; do
  echo "=== $name ==="
  timeout 3000 python -m vanderbei_tpu.evaluate --method hsd --out evaluate/r2 \
      --time-limit 900 --names "$name" 2>&1 | grep -v WARNING
done
