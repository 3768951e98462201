#!/bin/sh
# On-hardware kernel-parity lane (tests/test_tpu_kernels.py).
# The CPU suite pins jax to a virtual 8-device CPU mesh at import time, so
# this is a separate pytest invocation with the real TPU backend left active.
set -e
cd "$(dirname "$0")/.."
TIP_TPU_TESTS=1 exec python -m pytest tests -m tpu -q "$@"
