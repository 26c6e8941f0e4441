#!/usr/bin/env bash
# Measure the arkworks/Rust reference baseline on a CPU host.
#
# BASELINE.md's vs_baseline constant (bench.py: 5.0 prove+verify pairs/s for
# the 52-card m=2,n=26 shuffle on one core) is an ANALYTIC estimate — this
# container has no Rust toolchain or network. Run this script on any normal
# dev host to replace it with a measurement:
#
#   ./tools/baseline/run_baseline.sh [workdir]
#
# It clones the reference, builds in release mode, runs
# examples/parameter_selection (the reference's own benchmark harness,
# parameter_selection.rs:80-96) and a timed examples/round loop, and prints
# a JSON summary. Paste the measured pairs/s into
# bench.py:ARKWORKS_CPU_SHUFFLE52_PAIRS_PER_S and docs/PERF.md.
set -euo pipefail

WORK="${1:-$(mktemp -d)}"
REPO_URL="https://github.com/geometryxyz/mental-poker.git"

cd "$WORK"
if [ ! -d mental-poker ]; then
  git clone --depth 1 "$REPO_URL"
fi
cd mental-poker/barnett-smart-card-protocol

echo "== build (release) =="
cargo build --release --examples

echo "== parameter_selection (N=300, BLS12-377; reference harness) =="
/usr/bin/time -v cargo run --release --example parameter_selection 2>&1 | tail -40

echo "== round (m=2 n=26, 4 players, 4 shuffles): timed loop =="
# The round example is the canonical game shape (round.rs:229-231).
# 5 runs; report wall-clock per run. Each run includes 4 shuffle
# prove+verify-by-3 pairs => 16 prove-or-verify shuffle operations.
T0=$(date +%s.%N)
for i in 1 2 3 4 5; do cargo run --release --example round > /dev/null; done
T1=$(date +%s.%N)
python3 - "$T0" "$T1" <<'EOF'
import json, sys
t0, t1 = float(sys.argv[1]), float(sys.argv[2])
per_round = (t1 - t0) / 5.0
# 4 shuffles, each proved once and verified by the 3 other players
# (round.rs:263-350) -> 4 prove + 12 verify. A "prove+verify pair" in
# bench.py's metric is 1 prove + 1 verify; approximate pairs/run = 4
# (prove-dominated; verify ~ prove cost in BG).
print(json.dumps({
    "metric": "arkworks_round_wall_s",
    "seconds_per_round": round(per_round, 3),
    "approx_shuffle52_pairs_per_s": round(4.0 / per_round, 3),
    "note": "replace bench.py:ARKWORKS_CPU_SHUFFLE52_PAIRS_PER_S with the "
            "measured value; includes process startup overhead (subtract a "
            "no-op cargo run if material)",
}))
EOF
