"""Minimal lint gate (reference: tests/lint/ pylint config + task_lint.sh).

Zero-egress container: pylint/flake8 aren't baked in, so this checks the
high-signal invariants directly — syntax validity (compile), tabs,
trailing whitespace, and >100-char lines — over the package, tests,
examples and tools.
"""
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[2]
TARGETS = ["dgl_hack_tpu", "tests", "examples", "tools", "bench.py",
           "__graft_entry__.py"]
MAX_LEN = 100

errors = []
for t in TARGETS:
    p = ROOT / t
    files = [p] if p.is_file() else sorted(p.rglob("*.py"))
    for f in files:
        src = f.read_text()
        try:
            compile(src, str(f), "exec")
        except SyntaxError as e:
            errors.append(f"{f}:{e.lineno}: syntax error: {e.msg}")
            continue
        for i, line in enumerate(src.splitlines(), 1):
            if "\t" in line:
                errors.append(f"{f}:{i}: tab character")
            if line != line.rstrip():
                errors.append(f"{f}:{i}: trailing whitespace")
            if len(line) > MAX_LEN:
                errors.append(f"{f}:{i}: line too long ({len(line)})")

for e in errors[:50]:
    print(e)
print(f"{len(errors)} issue(s)")
sys.exit(1 if errors else 0)
