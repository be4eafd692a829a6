#!/bin/bash
# Run the test suite on the CPU backend WITHOUT claiming the TPU session.
#
# The container's sitecustomize registers a remote TPU ('axon') session in
# every python process when PALLAS_AXON_POOL_IPS is set; a long-running
# pytest would then hold the single-chip grant and block benchmarks.
# Clearing the variable keeps tests purely on CPU.
cd "$(dirname "$0")/.."
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
