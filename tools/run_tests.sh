#!/bin/sh
# CI entry: fast tier first (unit/parity, <5 min), then the slow tier
# (full-size parity, compile-heavy jit, learning proof) — together they are
# the complete suite; no coverage is lost to the tiering.
set -e
cd "$(dirname "$0")/.."
echo "=== fast tier ==="
python -m pytest tests/ -q
echo "=== slow tier ==="
python -m pytest tests/ -q -m slow
