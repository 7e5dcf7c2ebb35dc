"""DGMG generative-model training (reference: examples/pytorch/dgmg +
model_zoo/chem/dgmg.py).

Teacher-forced NLL over action traces of synthetic molecules, batched
with vmap; afterwards samples graphs and reports structural-validity
stats.
Usage: python examples/train_dgmg.py --epochs 15
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--n_graphs", type=int, default=48)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--samples", type=int, default=8)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from dgl_hack_tpu.models.dgmg import DGMG, build_action_trace

    rng = np.random.default_rng(0)
    max_nodes, max_edges = 10, 14
    max_steps = 2 * max_nodes + 2 * max_edges + 2

    # toy world: path graphs with alternating node types + a ring closure
    traces = []
    for _ in range(args.n_graphs):
        n = int(rng.integers(4, max_nodes - 1))
        nt = np.arange(n) % 2
        src = np.arange(n - 1)
        dst = np.arange(1, n)
        bonds = np.zeros(n - 1, np.int64)
        if rng.random() < 0.5 and n > 3:
            src = np.append(src, 0)
            dst = np.append(dst, n - 1)
            bonds = np.append(bonds, 1)
        traces.append(build_action_trace(nt, src, dst, bonds, max_steps))
    sts = jnp.asarray(np.stack([t[0] for t in traces]))
    lbs = jnp.asarray(np.stack([t[1] for t in traces]))

    model = DGMG(n_node_types=2, n_bond_types=2,
                 node_hidden_size=args.hidden, num_prop_rounds=2,
                 max_nodes=max_nodes, max_edges=max_edges)
    params = model.init(jax.random.PRNGKey(0), sts[0], lbs[0])
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            nll = jax.vmap(lambda a, b: model.apply(p, a, b))(sts, lbs)
            return nll.mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    t0 = time.perf_counter()
    first = None
    for ep in range(args.epochs):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    train_time = time.perf_counter() - t0

    valid = 0
    for i in range(args.samples):
        out = model.apply(params, jax.random.PRNGKey(100 + i),
                          method=DGMG.generate)
        n, e = int(out["num_nodes"]), int(out["num_edges"])
        src = np.asarray(out["src"])[:e]
        dst = np.asarray(out["dst"])[:e]
        ok = n > 0 and (e == 0 or (src.max() < n and dst.max() < n))
        valid += bool(ok)
    print(json.dumps({"model": "DGMG", "epochs": args.epochs,
                      "nll_first": round(first, 3),
                      "nll_last": round(float(loss), 3),
                      "sample_valid_frac": valid / args.samples,
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
