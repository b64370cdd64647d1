#!/usr/bin/env bash
# Chunked test runner: the XLA CPU backend_compile_and_load segfaults
# (~once per 15 min of compiles, nondeterministic, jax 0.8.x) can kill a
# monolithic pytest run.  Run per-file, retry crashed files once, report
# an aggregate.  Usage: scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
fails=()
for f in tests/test_*.py; do
    for attempt in 1 2; do
        timeout 1200 python -m pytest "$f" -q "$@"
        rc=$?
        if [ $rc -eq 0 ]; then break; fi
        # 139/134 = segfault/abort inside XLA compile: retry once
        if [ $rc -ne 139 ] && [ $rc -ne 134 ]; then break; fi
        echo "RETRY after crash (rc=$rc): $f"
    done
    [ $rc -ne 0 ] && fails+=("$f (rc=$rc)")
done
echo "================================================================"
if [ ${#fails[@]} -eq 0 ]; then
    echo "ALL FILES GREEN"
else
    printf 'FAILED: %s\n' "${fails[@]}"
    exit 1
fi
