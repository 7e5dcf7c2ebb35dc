"""Regression benchmark harness: run the example CLIs at pinned configs
and collect their JSON result lines into one report.

Reference: the ASV harness (asv.conf.json + tests/regression/bench_gcn.py
:13-62, bench_sage.py) wraps example scripts and scrapes their stdout for
time-per-epoch / accuracy.  Same idea here, JSON-native: every example
already prints ONE json line; this driver runs a pinned matrix, collects
the lines, and (optionally) diffs against a previous report to flag
regressions.

Usage:
  python tools/regression.py --out regression_report.json
  python tools/regression.py --out new.json --baseline old.json \
      --time-tolerance 1.3
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# pinned matrix: (example, args) — small enough for CI, large enough to
# regress meaningfully
MATRIX = [
    ("train_gcn.py", ["--dataset", "synth", "--epochs", "60"]),
    ("train_gat.py", ["--dataset", "synth", "--epochs", "60"]),
    ("train_gin.py", ["--dataset", "synth", "--epochs", "20"]),
    ("train_sgc.py", ["--dataset", "synth", "--epochs", "40"]),
    ("train_appnp.py", ["--dataset", "synth", "--epochs", "40"]),
    ("train_sage_sampling.py", ["--num-epochs", "3"]),
    ("train_rgcn.py", ["--epochs", "30"]),
    # AM-like row (VERDICT r4 #5): ~90 relations, larger + sparser
    # label set than AIFB — exercises the pair plan at a second shape
    ("train_rgcn.py", ["--dataset", "am", "--epochs", "12",
                       "--scale", "0.01"]),
    ("train_tagcn.py", ["--dataset", "synth", "--epochs", "60"]),
    ("train_ggnn.py", ["--epochs", "20", "--graphs", "40",
                       "--nodes", "20"]),
    ("train_rgcn_hetero.py", ["--epochs", "40", "--papers", "300"]),
    ("train_sage_cv.py", ["--epochs", "10", "--nodes", "1500",
                          "--batch-size", "128"]),
    ("train_kg.py", ["--max_step", "300"]),
    ("train_kg_dist.py", ["--steps", "80", "--scale", "0.02",
                          "--batch", "256", "--neg", "32",
                          "--chunk", "32", "--eval_triples", "100"]),
    ("train_chem.py", ["--model", "gcn", "--epochs", "15"]),
    ("train_chem.py", ["--model", "schnet", "--epochs", "10"]),
    ("train_chem.py", ["--model", "weave", "--epochs", "12"]),
    ("train_chem.py", ["--model", "wln", "--epochs", "12"]),
    ("train_han.py", ["--epochs", "30", "--papers", "200"]),
    ("train_cluster_gcn.py", ["--epochs", "10", "--parts", "4"]),
    ("train_dgi.py", ["--epochs", "30"]),
    ("train_gcmc.py", ["--epochs", "50"]),
    ("train_dgmg.py", ["--epochs", "8", "--n_graphs", "16"]),
    ("train_metapath2vec.py", ["--epochs", "3"]),
    ("train_pinsage_rec.py", ["--epochs", "40"]),
    ("train_transformer.py", ["--epochs", "150"]),
    ("train_rrn.py", ["--epochs", "200", "--batch", "48"]),
    ("train_adaptive_sampling.py", ["--epochs", "120"]),
    ("train_capsule.py", ["--epochs", "60"]),
    ("train_graphwriter.py", ["--epochs", "400"]),
    ("train_tree_lstm.py", ["--epochs", "8", "--n_trees", "24"]),
    ("pagerank.py", ["--n", "80", "--iters", "15"]),
]


def run_one(script, args, platform=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + os.pathsep + REPO
    if platform:
        # 'cpu' keeps regression runs off the (single-tenant) TPU;
        # default inherits the session platform (axon -> real TPU)
        env["JAX_PLATFORMS"] = platform
        if platform == "cpu":
            # hard kill-switch: the container's sitecustomize registers
            # the axon TPU backend whenever this var is set, and a child
            # touching jax before importing dgl_hack_tpu would claim the
            # single-tenant chip and wedge any concurrent TPU process
            env.pop("PALLAS_AXON_POOL_IPS", None)
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "examples", script)] + args,
            capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"script": script, "args": args, "ok": False,
                "wall_s": round(time.perf_counter() - t0, 2),
                "result": None, "stderr_tail": "TIMEOUT"}
    wall = time.perf_counter() - t0
    last = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            last = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    return {"script": script, "args": args, "ok": proc.returncode == 0,
            "wall_s": round(wall, 2), "result": last,
            "stderr_tail": proc.stderr.strip().splitlines()[-1]
            if proc.returncode != 0 and proc.stderr.strip() else None}


def compare(new, baseline, time_tol):
    """Flag runs that got slower than tol x baseline or lost accuracy."""
    base = {(r["script"], tuple(r["args"])): r for r in baseline["runs"]}
    flags = []
    for r in new["runs"]:
        b = base.get((r["script"], tuple(r["args"])))
        if b is None or not (r["ok"] and b["ok"]):
            continue
        nr, br = r["result"] or {}, b["result"] or {}
        t_new = nr.get("train_time_s")
        t_old = br.get("train_time_s")
        if t_new and t_old and t_new > time_tol * t_old:
            flags.append(f"{r['script']} {r['args']}: time "
                         f"{t_old} -> {t_new}")
        for key in ("test_acc", "mrr"):
            if key in nr and key in br and nr[key] < br[key] - 0.05:
                flags.append(f"{r['script']} {r['args']}: {key} "
                             f"{br[key]} -> {nr[key]}")
    return flags


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="regression_report.json")
    ap.add_argument("--baseline", default=None)
    ap.add_argument("--time-tolerance", type=float, default=1.3)
    ap.add_argument("--only", default=None,
                    help="substring filter on script names")
    ap.add_argument("--platform", default=None,
                    help="JAX_PLATFORMS for the children (e.g. cpu)")
    args = ap.parse_args()

    runs = []
    for script, sargs in MATRIX:
        if args.only and args.only not in script:
            continue
        r = run_one(script, sargs, args.platform)
        print(json.dumps(r), flush=True)
        runs.append(r)
    report = {"runs": runs, "ts": time.time(),
              "n_ok": sum(r["ok"] for r in runs), "n": len(runs)}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)

    if args.baseline:
        with open(args.baseline) as f:
            baseline = json.load(f)
        flags = compare(report, baseline, args.time_tolerance)
        for fl in flags:
            print("REGRESSION:", fl)
        sys.exit(1 if flags else 0)
    sys.exit(0 if report["n_ok"] == report["n"] else 1)


if __name__ == "__main__":
    main()
