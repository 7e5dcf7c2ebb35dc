"""Child-Sum TreeLSTM over topological propagation
(reference: examples/pytorch/tree_lstm — SST sentiment; the canonical
UDF message/reduce + prop_nodes_topo workload, exercising the padded
dense-mailbox replacement for degree bucketing).

Offline task: synthetic expression trees whose root label is the
majority class of the leaf tokens.
Usage: python examples/train_tree_lstm.py --epochs 30
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--n_trees", type=int, default=60)
    p.add_argument("--vocab", type=int, default=6)
    p.add_argument("--classes", type=int, default=3)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_hack_tpu as dgl
    from dgl_hack_tpu.core.message import pull
    from dgl_hack_tpu.core.traversal import topological_nodes_generator

    rng = np.random.default_rng(0)
    H, V, C = args.hidden, args.vocab, args.classes

    def make_tree():
        """Random binary tree, edges child -> parent; leaf tokens carry
        class signal (token % classes), root label = leaf majority."""
        n_leaves = int(rng.integers(3, 7))
        tokens, parents = [], []
        # build bottom-up: queue of roots of subtrees
        nodes = []
        for _ in range(n_leaves):
            nodes.append(len(tokens))
            tokens.append(int(rng.integers(0, V)))
            parents.append(-1)
        roots = list(nodes)
        while len(roots) > 1:
            a = roots.pop(int(rng.integers(0, len(roots))))
            b = roots.pop(int(rng.integers(0, len(roots))))
            pid = len(tokens)
            tokens.append(V)          # internal marker token
            parents.append(-1)
            parents[a] = pid
            parents[b] = pid
            roots.append(pid)
        src = [i for i, pa in enumerate(parents) if pa >= 0]
        dst = [parents[i] for i in src]
        g = dgl.graph((np.asarray(src, np.int32), np.asarray(dst, np.int32)),
                      num_nodes=len(tokens))
        leaf_cls = [t % C for t in tokens[:n_leaves]]
        label = int(np.bincount(leaf_cls, minlength=C).argmax())
        # topo frontiers are host-side structure: precompute, pass static
        frontiers = tuple(tuple(int(v) for v in f)
                          for f in topological_nodes_generator(g))
        return g, np.asarray(tokens, np.int32), roots[0], label, frontiers

    trees = [make_tree() for _ in range(args.n_trees)]
    n_train = int(0.8 * len(trees))

    def init_params(key):
        ks = jax.random.split(key, 6)
        s = 0.2
        return {
            "emb": jax.random.normal(ks[0], (V + 1, H)) * s,
            "W_iou": jax.random.normal(ks[1], (H, 3 * H)) * s,
            "b_iou": jnp.zeros((3 * H,)),
            "U_iou": jax.random.normal(ks[2], (H, 3 * H)) * s,
            "U_f": jax.random.normal(ks[3], (H, H)) * s,
            "b_f": jnp.zeros((H,)),
            "W_out": jax.random.normal(ks[4], (H, C)) * s,
        }

    def run_tree(params, g, tokens, frontiers):
        x = params["emb"][tokens]
        g.ndata["iou"] = x @ params["W_iou"] + params["b_iou"]
        g.ndata["h"] = jnp.zeros((g.num_nodes(), H))
        g.ndata["c"] = jnp.zeros((g.num_nodes(), H))

        def message(edges):
            return {"mh": edges.src["h"], "mc": edges.src["c"]}

        def reduce(nodes):
            # padded dense mailbox (N, D, H); mask marks real children
            mh = nodes.mailbox["mh"]
            mc = nodes.mailbox["mc"]
            mask = nodes.mask[:, :, None]
            h_tilde = (mh * mask).sum(1)
            f = jax.nn.sigmoid(mh @ params["U_f"] + params["b_f"])
            c_acc = (f * mc * mask).sum(1)
            iou = nodes.data["iou"] + h_tilde @ params["U_iou"]
            i, o, u = jnp.split(jax.nn.sigmoid(iou), 3, axis=1)
            u = jnp.tanh(iou[:, 2 * H:])
            c = i * u + c_acc
            h = o * jnp.tanh(c)
            return {"h": h, "c": c}

        for f in frontiers:
            pull(g, jnp.asarray(f, jnp.int32), message, reduce,
                 max_degree=2)
        return g.ndata["h"]

    def loss_fn(params, g, tokens, root, label, frontiers):
        h = run_tree(params, g, tokens, frontiers)
        logits = h[root] @ params["W_out"]
        return -jax.nn.log_softmax(logits)[label]

    params = init_params(jax.random.PRNGKey(0))
    tx = optax.adam(args.lr)
    opt = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn),
                      static_argnums=(3, 4, 5))

    t0 = time.perf_counter()
    for ep in range(args.epochs):
        total = 0.0
        for g, tokens, root, label, frontiers in trees[:n_train]:
            loss, grads = grad_fn(params, g, jnp.asarray(tokens), root,
                                  label, frontiers)
            up, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, up)
            total += float(loss)
    train_time = time.perf_counter() - t0

    correct = 0
    for g, tokens, root, label, frontiers in trees[n_train:]:
        h = run_tree(params, g, jnp.asarray(tokens), frontiers)
        pred = int((h[root] @ params["W_out"]).argmax())
        correct += pred == label
    acc = correct / max(1, len(trees) - n_train)
    print(json.dumps({"model": "ChildSumTreeLSTM", "epochs": args.epochs,
                      "test_acc": round(acc, 4),
                      "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
