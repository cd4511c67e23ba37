#!/usr/bin/env bash
# CI entry: full test suite on the virtual CPU mesh + a fuzz smoke pass.
# (The reference's CI runs cargo test + clippy; this is the equivalent gate.)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
JAX_PLATFORMS=cpu python - <<'PY'
import jax; jax.config.update("jax_platforms", "cpu")
from seqrush_tpu.tools.fuzz import main
raise SystemExit(main(["--trials", "12"]))
PY
echo "CI OK"
