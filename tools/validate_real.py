"""Real-dataset accuracy validation runbook (BASELINE.md targets).

This container is zero-egress, so the 5 BASELINE accuracy configs cannot
run in CI — every loader falls back to a synthetic stand-in.  When the
raw files ARE present (place them under ``$DGL_DOWNLOAD_DIR``, default
``~/.dgl_tpu``), this tool runs each config on the real data and compares
against the reference's published numbers.

Expected raw-data layout (formats validated byte-level by
tests/test_real_parsers.py over tests/fixtures/data):

    $DGL_DOWNLOAD_DIR/
      cora/ind.cora.{x,y,tx,ty,allx,ally,graph,test.index}   (planetoid)
      citeseer/ind.citeseer.*                                 (planetoid)
      pubmed/ind.pubmed.*                                     (planetoid)
      reddit/reddit_data.npz, reddit/reddit_graph.npz
      aifb/aifb.npz      (preprocessed RDF: src,dst,etypes,labels,masks)
      am/am.npz
      FB15k/{entities.dict,relations.dict,train.txt,valid.txt,test.txt}

The example CLIs these configs drive carry the ROUND-5 tuned kernel
defaults on TPU automatically: train_gat.py prepares mixed-direction
fused-GAT plans (fwd bucketed / rev chunked) and the IN-KERNEL fused
backward is the default (gat_bwd='fused', train step 122 -> 67.8
ns/edge; DGL_TPU_GAT_BWD_FUSED=0 restores round 4's compact path),
train_rgcn.py attaches the two-level (dst,etype)-pair plan with the
row-count-law rev bucketing (bucket_rows_rev='auto'), train_gcn.py
prepares the hybrid dense-hub gspmm plan — so a parity run exercises
exactly the shipped fast paths (KERNELS.md round 5).

Usage:
    python tools/validate_real.py            # run whatever data is present
    python tools/validate_real.py --only gcn_cora gat_cora

Targets (reference's own READMEs, see BASELINE.md):
    gcn_cora        test acc ≈ 0.813 ± 0.01   (README.md:107)
    gat_cora        test acc ≈ 0.840 ± 0.01   (examples/pytorch/gat/README.md:44)
    gat_citeseer    test acc ≈ 0.709 ± 0.01
    sage_reddit     test acc ≈ 0.950           (graphsage/README.md:43-47)
    rgcn_aifb       test acc ≈ 0.972           (rgcn/README.md:21)
    rgcn_am         test acc ≈ 0.874
    transe_fb15k    MRR ≈ 0.665                (apps/kg/README.md:74-82)
    distmult_fb15k  MRR ≈ 0.725
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("DGL_DOWNLOAD_DIR", os.path.expanduser("~/.dgl_tpu"))

# name -> (presence-check path, argv, metric key, target, tolerance)
CONFIGS = {
    "gcn_cora": ("cora/ind.cora.graph",
                 ["examples/train_gcn.py", "--dataset", "cora",
                  "--epochs", "200"],
                 "test_acc", 0.813, 0.015),
    "gat_cora": ("cora/ind.cora.graph",
                 ["examples/train_gat.py", "--dataset", "cora",
                  "--epochs", "200"],
                 "test_acc", 0.840, 0.015),
    "gat_citeseer": ("citeseer/ind.citeseer.graph",
                     ["examples/train_gat.py", "--dataset", "citeseer",
                      "--epochs", "200"],
                     "test_acc", 0.709, 0.015),
    "sage_reddit": ("reddit/reddit_data.npz",
                    ["examples/train_sage_sampling.py", "--dataset",
                     "reddit", "--num-epochs", "10"],
                    "test_acc", 0.950, 0.01),
    "rgcn_aifb": ("aifb/aifb.npz",
                  ["examples/train_rgcn.py", "--dataset", "aifb",
                   "--epochs", "50"],
                  "test_acc", 0.972, 0.03),
    "rgcn_am": ("am/am.npz",
                ["examples/train_rgcn.py", "--dataset", "am",
                 "--epochs", "50", "--num-bases", "40"],
                "test_acc", 0.874, 0.03),
    "transe_fb15k": ("FB15k/train.txt",
                     ["examples/train_kg.py", "--dataset", "FB15k",
                      "--model", "TransE_l2", "--max_step", "32000",
                      "--batch_size", "1024", "--neg_sample_size", "256",
                      "--hidden_dim", "400", "--lr", "0.25",
                      "--gamma", "19.9"],
                     "MRR", 0.665, 0.02),
    "distmult_fb15k": ("FB15k/train.txt",
                       ["examples/train_kg.py", "--dataset", "FB15k",
                        "--model", "DistMult", "--max_step", "32000",
                        "--batch_size", "1024", "--neg_sample_size", "256",
                        "--hidden_dim", "400", "--lr", "0.08"],
                       "MRR", 0.725, 0.02),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of config names")
    ap.add_argument("--dry-run", action="store_true",
                    help="print what would run, without running")
    args = ap.parse_args()

    results = {}
    for name, (probe, argv, key, target, tol) in CONFIGS.items():
        if args.only and name not in args.only:
            continue
        present = os.path.exists(os.path.join(DATA, probe))
        if not present:
            results[name] = {"status": "skipped",
                             "reason": f"missing {probe} under {DATA}"}
            continue
        if args.dry_run:
            results[name] = {"status": "would_run", "argv": argv}
            continue
        out = subprocess.run([sys.executable] + argv, cwd=REPO,
                             capture_output=True, text=True, timeout=7200)
        try:
            res = json.loads(out.stdout.strip().splitlines()[-1])
            val = float(res[key])
        except Exception:
            results[name] = {"status": "error",
                             "stderr": out.stderr[-500:]}
            continue
        results[name] = {"status": "ok" if val >= target - tol else "BELOW",
                         key: val, "target": target, "tol": tol}
    print(json.dumps(results, indent=2))
    bad = [n for n, r in results.items() if r["status"] in ("BELOW", "error")]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
