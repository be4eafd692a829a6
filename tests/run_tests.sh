#!/bin/bash
# Run the test suite on the CPU backend WITHOUT claiming the TPU session.
#
# The container's sitecustomize registers a remote TPU ('axon') session in
# every python process when PALLAS_AXON_POOL_IPS is set; a long-running
# pytest would then hold the single-chip grant and block benchmarks.
# Clearing the variable keeps tests purely on CPU.
#
# Each test file runs in its OWN pytest process: a single process running
# streaming+sharding+tensor back-to-back accumulates jit executables and
# device arrays until the interpreter SIGABRTs on the 2-core/low-RAM box
# (round-4 Weak #9).  The persistent XLA compilation cache keeps the
# per-file restart cost low.  Any extra args are forwarded to every file's
# pytest invocation (e.g. -m smoke).
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
rc=0
failed=()
for f in tests/test_*.py; do
    echo "=== $f ==="
    python -m pytest "$f" -q "$@"
    r=$?
    # pytest exit 5 = no tests collected (e.g. everything deselected by a
    # marker filter) — not a failure for a per-file loop
    if [ "$r" != 0 ] && [ "$r" != 5 ]; then
        rc=1
        failed+=("$f")
    fi
done
if [ "$rc" != 0 ]; then
    echo "FAILED files: ${failed[*]}"
else
    echo "all test files green"
fi
exit $rc
