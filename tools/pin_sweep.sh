#!/usr/bin/env bash
# Pin-sweep: run every golden-pinned query at local[4], local[16], local[32]
# and assert the VALUES are identical across all three. Run-determinism is
# not enough to trust a pin — sketch-style partial aggregates merge in
# partition order, so an estimate can be perfectly stable per-config yet
# differ across core counts (round 4: x7b's HLL union gave 493 @ 4 cores
# vs 499 @ 32). Any query failing this sweep must not be raw-pinned; give
# it a partition-invariant oracle (exact value + error-bound boolean).
#
# Usage: tools/pin_sweep.sh [sfdir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SFDIR="${1:-/root/testdata/sf0.01}"
# the file-based-oracle (pinned) query list, derived from fixtures/
PINNED=$(ls fixtures/*_sf001.parquet | sed 's|fixtures/||; s|_sf001.parquet||' | paste -sd,)
echo "sweeping pins: $PINNED"
for cpus in 4 16 32; do
  echo "--- local[$cpus] ---"
  SPARK_GRAFT_CPUS=$cpus sbt -batch \
    "runMain graft.Verify $SFDIR /tmp/pinsweep_$cpus $PINNED" \
    > "/tmp/pinsweep_$cpus.log" 2>&1 \
    || { echo "Verify failed at local[$cpus] — see /tmp/pinsweep_$cpus.log"; exit 1; }
done
python3 - "$PINNED" <<'EOF'
import duckdb, sys
fail = 0
for name in sys.argv[1].split(","):
    vals = {}
    for cpus in (4, 16, 32):
        try:
            rows = duckdb.sql(
                f"SELECT * FROM read_parquet('/tmp/pinsweep_{cpus}/{name}/part-*.parquet')"
            ).fetchall()
            # order-insensitive, array-safe normalization
            vals[cpus] = sorted(tuple(str(c) for c in r) for r in rows)
        except Exception as e:
            vals[cpus] = f"ERR: {e}"
    if vals[4] == vals[16] == vals[32]:
        print(f"   {name}: invariant across 4/16/32 cores ({len(vals[4])} rows)")
    else:
        fail += 1
        print(f"XX {name}: VALUES DIFFER ACROSS CORE COUNTS — do not pin raw")
        for cpus in (4, 16, 32):
            v = vals[cpus]
            print(f"     local[{cpus}]: {str(v)[:160]}")
print(f"\n{fail} environment-sensitive pin(s)" if fail else "\nall pins environment-invariant")
sys.exit(1 if fail else 0)
EOF
