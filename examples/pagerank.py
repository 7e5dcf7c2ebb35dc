"""PageRank via message passing (reference: examples/pytorch/pagerank.py
— the canonical DGL update_all demo).

TPU shape: the whole power iteration is one jitted lax.fori_loop over a
single gspmm per step.
Usage: python examples/pagerank.py --n 100 --iters 20
"""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100)
    p.add_argument("--edges", type=int, default=600)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--damp", type=float, default=0.85)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import dgl_hack_tpu as dgl

    rng = np.random.default_rng(0)
    src = rng.integers(0, args.n, args.edges).astype(np.int32)
    dst = rng.integers(0, args.n, args.edges).astype(np.int32)
    g = dgl.graph((src, dst), num_nodes=args.n)
    deg_out = jnp.maximum(g.out_degrees().astype(jnp.float32), 1.0)

    @jax.jit
    def pagerank(graph, deg):
        pv0 = jnp.full((graph.num_dst_nodes, 1), 1.0 / args.n)

        def body(i, pv):
            agg = dgl.gspmm(graph, "copy_lhs", "sum", pv / deg[:, None])
            return (1 - args.damp) / args.n + args.damp * agg
        return jax.lax.fori_loop(0, args.iters, body, pv0)[:, 0]

    pv = pagerank(g, deg_out)
    top = np.argsort(np.asarray(pv))[::-1][:5]
    print(json.dumps({"model": "pagerank", "iters": args.iters,
                      "sum": round(float(pv.sum()), 4),
                      "top5": top.tolist()}))


if __name__ == "__main__":
    main()
