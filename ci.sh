#!/bin/sh
# CI entry (reference Jenkinsfile parity): build native, run the suite
# in-process AND over HTTP (the suite includes both transports), then the
# shell-level walkthrough smoke test.
set -e

make -C native
python -m pytest tests/ -q
# TPU lane: device-only kernel paths (in-kernel PRNG) on the real chip;
# the marked tests self-skip when no accelerator is attached.
SDA_TEST_PLATFORM=native python -m pytest tests/ -q -m tpu
sh examples/simple-cli-example.sh tmp/ci-simple-data 18890 | tail -1 | grep -q "result: 0 2 2 4 4 6 6 8 8 10"
# API reference: builds from live docstrings; import failures fail CI
python docs/gen_api.py
echo "CI OK"
