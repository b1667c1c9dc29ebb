#!/usr/bin/env bash
# Thin resume wrapper: run_flagship.sh from workload 2 onward (kept for the
# documented recovery of the round-2 tunnel outage; the budgets live in
# run_flagship.sh — no duplicated pipeline).
# default to workload 2 but let an explicit START override the default
exec env START="${START:-2}" bash "$(dirname "$0")/run_flagship.sh" "$@"
