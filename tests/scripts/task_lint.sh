#!/usr/bin/env bash
# Lint task (reference: tests/scripts/task_lint.sh + tests/lint pylintrc).
set -e
cd "$(dirname "$0")/../.."
exec python tests/lint/check.py
