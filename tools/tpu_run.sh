#!/bin/bash
# Run a python script on the tunneled TPU, retrying while the single-chip
# grant is held by a recently-exited process (axon releases lazily).
# Usage: tools/tpu_run.sh script.py [args...]
for i in $(seq 1 20); do
  PYTHONPATH=/root/repo:${PYTHONPATH} python -u - "$@" <<'PY' && exit 0
import sys
try:
    import jax
    jax.devices()
except RuntimeError as e:
    sys.exit(42)
import runpy
sys.argv = sys.argv[1:]
runpy.run_path(sys.argv[0], run_name="__main__")
PY
  rc=$?
  [ $rc -ne 42 ] && exit $rc
  echo "TPU busy (attempt $i), waiting..." >&2
  sleep 45
done
echo "TPU never became available" >&2
exit 1
