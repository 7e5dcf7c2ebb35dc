"""Knowledge-graph embedding training (reference: apps/kg/train.py).

python examples/train_kg.py --model_name TransE_l2 --dataset FB15k \
    --batch_size 1024 --neg_sample_size 256 --hidden_dim 400 \
    --gamma 19.9 --lr 0.25 --max_step 2000
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="TransE_l2",
                   choices=["TransE_l1", "TransE_l2", "DistMult", "ComplEx",
                            "RESCAL", "RotatE", "TransR"])
    p.add_argument("--sparse_emb", action="store_true",
                   help="sparse-row Adagrad on the embedding tables "
                        "(reference: ExternalEmbedding)")
    p.add_argument("--async_update", action="store_true",
                   help="one-step-stale row updates overlapped with batch "
                        "prep (reference: --async_update); implies "
                        "--sparse_emb")
    p.add_argument("--dataset", default="FB15k")
    p.add_argument("--kg-scale", type=float, default=0.1)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--neg_sample_size", type=int, default=256)
    p.add_argument("--neg_chunk_size", type=int, default=64)
    p.add_argument("--hidden_dim", type=int, default=200)
    p.add_argument("--gamma", type=float, default=19.9)
    p.add_argument("--lr", type=float, default=0.25)
    p.add_argument("--max_step", type=int, default=2000)
    p.add_argument("--neg_adversarial_sampling", action="store_true")
    p.add_argument("--adversarial_temperature", type=float, default=1.0)
    p.add_argument("--regularization_coef", type=float, default=0.0)
    p.add_argument("--eval_size", type=int, default=2000)
    p.add_argument("--save_path", default=None)
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from dgl_hack_tpu.data.kg import load_kg_dataset
    from dgl_hack_tpu.models.kg import (KEModel, eval_ranks, make_train_step,
                                        make_sparse_train_step,
                                        init_sparse_state, save_emb)

    ds = load_kg_dataset(args.dataset, scale=args.kg_scale)
    print(f"{ds.name}: {ds.num_entities} entities, {ds.num_relations} "
          f"relations, {len(ds.train[0])} train triples")
    model = KEModel(ds.num_entities, ds.num_relations, args.hidden_dim,
                    args.model_name, gamma=args.gamma)
    sparse = args.sparse_emb or args.async_update
    if sparse:
        state = init_sparse_state(model)
        if args.async_update:
            step, empty_pending = make_sparse_train_step(
                model, args.lr, args.neg_chunk_size,
                args.neg_adversarial_sampling, args.adversarial_temperature,
                args.regularization_coef, async_update=True)
        else:
            step = make_sparse_train_step(
                model, args.lr, args.neg_chunk_size,
                args.neg_adversarial_sampling, args.adversarial_temperature,
                args.regularization_coef)
    else:
        tx = optax.adagrad(args.lr)
        state = tx.init(model.params)
        step = make_train_step(model, tx, args.neg_chunk_size,
                               args.neg_adversarial_sampling,
                               args.adversarial_temperature,
                               args.regularization_coef)
    h, r, t = ds.train
    rng = np.random.default_rng(0)
    params = model.params
    C = args.batch_size // args.neg_chunk_size
    pending = None
    if args.async_update:
        pending = empty_pending(args.batch_size,
                                (C, args.neg_sample_size),
                                params["entity"].shape[1],
                                params["relation"].shape[1])
    t0 = time.perf_counter()
    for it in range(args.max_step):
        sel = rng.integers(0, len(h), args.batch_size)
        neg = rng.integers(0, ds.num_entities,
                           (C, args.neg_sample_size)).astype(np.int32)
        batch = (jnp.asarray(h[sel]), jnp.asarray(r[sel]),
                 jnp.asarray(t[sel]), jnp.asarray(neg),
                 jnp.asarray(bool(it % 2)))  # alternate head/tail corruption
        if args.async_update:
            params, state, loss, pending = step(params, state, *batch,
                                                pending)
        else:
            params, state, loss = step(params, state, *batch)
        if (it + 1) % 500 == 0:
            print(f"step {it+1}: loss {float(loss):.4f} "
                  f"({(it+1)/(time.perf_counter()-t0):.1f} steps/s)")
    train_time = time.perf_counter() - t0

    th, tr_, tt = ds.test
    k = min(args.eval_size, len(th))
    metrics = eval_ranks(model, params, th[:k], tr_[:k], tt[:k])
    if args.save_path:
        save_emb(args.save_path, params)
    print(json.dumps({"dataset": ds.name, "model": args.model_name,
                      "train_time_s": train_time, **metrics}))


if __name__ == "__main__":
    main()
