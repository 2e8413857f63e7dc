#!/bin/sh
# CI entry (reference Jenkinsfile parity): build native, run the suite
# in-process AND over HTTP (the suite includes both transports), then the
# shell-level walkthrough smoke test.
set -e

make -C native
python -m pytest tests/ -q
sh examples/simple-cli-example.sh tmp/ci-simple-data 18890 | tail -1 | grep -q "result: 0 2 2 4 4 6 6 8 8 10"
echo "CI OK"
