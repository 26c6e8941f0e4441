#!/usr/bin/env bash
# CI gate — mirrors the reference's workflow roles (style/test/portability,
# `.github/workflows/test.yml:12-103`) for this repo:
#
#   1. fast subset   — algebra + transcript unit tests (quick signal)
#   2. full suite    — `python -m pytest tests/ -q` (the `cargo test` role)
#   3. bench smoke   — one tiny shuffle prove+verify through bench.py's path
#   4. multichip     — the 8-virtual-device dryrun (`__graft_entry__.py`)
#
# Usage: scripts/ci.sh [--fast|smoke]   (--fast: step 1 only; smoke: steps 3-4 only)
set -euo pipefail
cd "$(dirname "$0")/.."

# Huge XLA:CPU compiles need a big stack (see utils/cache.py:raise_stack_limit).
ulimit -Ss unlimited 2>/dev/null || ulimit -Ss 524288 || true

if [[ "${1:-}" != "smoke" ]]; then
echo "== [1/4] fast subset"
python -m pytest tests/test_field.py tests/test_curve.py tests/test_transcript.py \
  tests/test_hash_jax.py -q -p no:cacheprovider

if [[ "${1:-}" == "--fast" ]]; then exit 0; fi

echo "== [2/4] full suite (slow-marked tests excluded; MPTPU_CI_SLOW=1 adds them)"
python -m pytest tests/ -q -m "not slow" -p no:cacheprovider
if [[ "${MPTPU_CI_SLOW:-}" == "1" ]]; then
  echo "== [2b] slow tests (canonical shapes / interpret-mode kernels)"
  python -m pytest tests/ -q -m slow -p no:cacheprovider
fi
fi

echo "== [3/4] bench smoke (CPU, tiny shape)"
JAX_PLATFORMS=cpu MPTPU_BENCH_SMOKE=1 MPTPU_BENCH_REPS=1 MPTPU_BENCH_BATCH=2 \
  python bench.py

echo "== [4/4] multichip dryrun"
python - <<'EOF'
import __graft_entry__ as g
g.dryrun_multichip(8)
EOF

echo "CI gate: all green"
