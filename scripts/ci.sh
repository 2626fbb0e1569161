#!/usr/bin/env bash
# CI gate — equivalent of the reference's .github/workflows/rust.yml:12-24
# (build + fmt + `cargo test -- --nocapture` on every push).
#
# Stage 0: byte-compile every module (the "build").
# Stage 1: fast test tier (default pytest.ini selection, < 10 min).
# Stage 2: slow tier (heavy XLA:CPU compiles) — opt-in via CI_SLOW=1.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== stage 0: byte-compile =="
python -m compileall -q halo2_tpu tests bench.py __graft_entry__.py

echo "== stage 0.5: lint/format (cargo-fmt analog; ruff unavailable in image) =="
python scripts/lint.py

echo "== stage 1: fast test tier =="
python -m pytest tests/ -x -q

if [[ "${CI_SLOW:-0}" == "1" ]]; then
  echo "== stage 2: slow tier =="
  python -m pytest tests/ -x -q -m slow
fi
echo "CI OK"
