#!/usr/bin/env bash
# Example smoke task (reference: tests/scripts/task_example_test.sh).
set -e
cd "$(dirname "$0")/../.."
exec python -m pytest tests/test_examples.py -q "$@"
