#!/usr/bin/env bash
# Run a TPU job with hang protection: wait for the tunnel to pass the
# COMPUTE probe, run the command under a hard timeout, and retry on
# timeout/stall. The axon tunnel has been observed (r4) to enumerate
# devices while hanging every real dispatch with zero CPU use — a plain
# launch stalls forever and no in-process code can recover it.
#
#   scripts/tpu_retry.sh <job_timeout_s> <max_attempts> <cmd...>
set -uo pipefail
cd "$(dirname "$0")/.."

JOB_TIMEOUT="$1"; shift
MAX_ATTEMPTS="$1"; shift

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "# [tpu_retry] attempt $attempt/$MAX_ATTEMPTS: waiting for compute probe"
  for probe in $(seq 1 60); do
    if python -c "
from __graft_entry__ import _safe_compute_probe
import sys; sys.exit(0 if _safe_compute_probe() else 1)"; then
      break
    fi
    echo "# [tpu_retry] probe $probe failed; sleeping 240 s"
    sleep 240
  done
  echo "# [tpu_retry] running: $*"
  timeout --kill-after=30 "$JOB_TIMEOUT" "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "# [tpu_retry] success on attempt $attempt"
    exit 0
  fi
  echo "# [tpu_retry] attempt $attempt exited rc=$rc (124=timeout/stall)"
done
echo "# [tpu_retry] giving up after $MAX_ATTEMPTS attempts"
exit 1
