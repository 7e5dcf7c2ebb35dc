"""Distributed knowledge-graph embedding training over the KVStore.

The reference's true multi-machine path (SURVEY §3.4): KVServers hold
partitioned entity/relation embeddings, trainer clients pull rows per
batch, compute gradients, and push sparse updates back
(reference: apps/kg/kvserver.py start_server:123 — KGEServer with a
sparse-Adagrad push handler; apps/kg/kvclient.py start_worker:189;
models/general_models.py pull_model:485 / push_gradient:502;
apps/kg/distributed/launch.sh).

TPU-native division of labour: the score function, loss and row
gradients are jitted JAX (`KEModel.loss_from_rows` — differentiating
wrt pre-gathered rows yields exactly the sparse per-row grads the
reference's ExternalEmbedding.update consumes); the storage/transport
plane is distributed/kvstore.py over native TCP (threads here stand in
for the reference's per-machine processes; the wire protocol is the
same either way).

Usage: python examples/train_kg_dist.py --num_servers 2 --num_clients 2
"""
import argparse
import json
import sys
import threading
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="FB15k")
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--model", default="TransE_l2")
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--gamma", type=float, default=12.0)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--neg", type=int, default=64)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--num_servers", type=int, default=2)
    p.add_argument("--num_clients", type=int, default=2)
    p.add_argument("--eval_triples", type=int, default=500)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from dgl_hack_tpu.data import synthetic_kg
    from dgl_hack_tpu.distributed import KVClient, KVServer
    from dgl_hack_tpu.distributed.kvstore import make_transports
    from dgl_hack_tpu.models.kg import KEModel, eval_ranks

    ds = synthetic_kg(args.dataset, scale=args.scale, seed=0)
    model = KEModel(ds.num_entities, ds.num_relations, args.hidden,
                    score_func=args.model, gamma=args.gamma)
    ent0 = np.asarray(model.params["entity"])
    rel0 = np.asarray(model.params["relation"])
    NE = ds.num_entities
    S, C = args.num_servers, args.num_clients

    # range partition books (reference: partition books built from the
    # METIS partition in kvclient.py:195-202; range here — the synthetic
    # ids carry no locality)
    bounds = np.linspace(0, NE, S + 1).astype(np.int64)
    ent_book = np.searchsorted(bounds[1:], np.arange(NE), side="right")
    rel_book = np.zeros(ds.num_relations, np.int64)   # relations on srv 0

    class KGEServer(KVServer):
        """Sparse-Adagrad push handler (reference: kvserver.py:35)."""

        def _local_ids(self, name, ids):
            # *_grad pushes address the base table's partition
            base = name[:-5] if name.endswith("_grad") else name
            return super()._local_ids(base, ids)

        def _push_handler(self, name, local_ids, data):
            if name.endswith("_grad"):
                base = name[:-5]
                state = self._data[base + "_state"]
                np.add.at(state, local_ids, (data ** 2).mean(-1))
                scale = 1.0 / np.sqrt(state[local_ids] + 1e-10)
                np.add.at(self._data[base], local_ids,
                          -args.lr * data * scale[:, None])
            else:
                np.add.at(self._data[name], local_ids, data)

    server_t, client_t = make_transports(S, C, base_port=0)

    def serve(i):
        sv = KGEServer(i, C, transport=server_t(i))
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        sv.init_data("entity", ent0[lo:hi].copy(), offset=lo)
        sv.init_data("entity_state",
                     np.zeros(hi - lo, np.float32), offset=lo)
        if i == 0:
            sv.init_data("relation", rel0.copy())
            sv.init_data("relation_state",
                         np.zeros(ds.num_relations, np.float32))
        sv.start()

    server_threads = [threading.Thread(target=serve, args=(i,),
                                       daemon=True) for i in range(S)]
    for t in server_threads:
        t.start()

    h_all, r_all, t_all = (np.asarray(x) for x in ds.train)
    n_train = len(h_all)

    # row-gradient function: grads wrt PULLED rows only (sparse)
    @jax.jit
    def row_grads(h, r, t, nc, neg_is_head):
        def loss(hr, rr, tr, nr):
            return model.loss_from_rows(hr, rr, tr, nr, neg_is_head,
                                        args.chunk)
        val, grads = jax.value_and_grad(loss, (0, 1, 2, 3))(h, r, t, nc)
        return val, grads

    results = {}

    def work(cid):
        rng = np.random.default_rng(100 + cid)
        client = KVClient(cid, S, transport=client_t(cid))
        client.set_partition_book("entity", ent_book)
        client.set_partition_book("entity_grad", ent_book)
        client.set_partition_book("relation", rel_book)
        client.set_partition_book("relation_grad", rel_book)
        losses = []
        for step in range(args.steps):
            idx = rng.integers(0, n_train, args.batch)
            hb, rb, tb = h_all[idx], r_all[idx], t_all[idx]
            n_chunks = args.batch // args.chunk
            negs = rng.integers(0, NE, (n_chunks, args.neg)).astype(np.int64)
            neg_is_head = bool(step % 2)

            # pull (reference: general_models.py pull_model:485)
            h_rows = client.pull("entity", hb)
            t_rows = client.pull("entity", tb)
            n_rows = client.pull("entity", negs.reshape(-1)).reshape(
                n_chunks, args.neg, -1)
            r_rows = client.pull("relation", rb)

            val, (gh, gr, gt, gn) = row_grads(
                jnp.asarray(h_rows), jnp.asarray(r_rows),
                jnp.asarray(t_rows), jnp.asarray(n_rows), neg_is_head)
            losses.append(float(val))

            # push sparse row grads through the Adagrad handler
            # (reference: push_gradient:502; *_grad names route to the
            # KGEServer handler, duplicates coalesce via np.add.at)
            client.push("entity_grad", hb, np.asarray(gh))
            client.push("entity_grad", tb, np.asarray(gt))
            client.push("entity_grad", negs.reshape(-1),
                        np.asarray(gn).reshape(n_chunks * args.neg, -1))
            client.push("relation_grad", rb, np.asarray(gr))
        results[cid] = losses
        client.barrier()
        if cid == 0:
            # pull full tables for eval (reference: eval after training)
            ent = client.pull("entity", np.arange(NE))
            rel = client.pull("relation", np.arange(ds.num_relations))
            results["params"] = {"entity": jnp.asarray(ent),
                                 "relation": jnp.asarray(rel)}
        client.shutdown()

    t0 = time.perf_counter()
    client_threads = [threading.Thread(target=work, args=(i,))
                      for i in range(C)]
    for t in client_threads:
        t.start()
    for t in client_threads:
        t.join()
    train_time = time.perf_counter() - t0
    for t in server_threads:
        t.join(timeout=10)

    loss0 = np.mean(results[0][:10])
    loss1 = np.mean(results[0][-10:])
    te = ds.test
    k = min(args.eval_triples, len(te[0]))
    metrics = eval_ranks(model, results["params"], te[0][:k], te[1][:k],
                         te[2][:k])
    print(json.dumps({
        "dataset": ds.name, "model": args.model, "steps": args.steps,
        "num_servers": S, "num_clients": C,
        "loss_first10": round(float(loss0), 4),
        "loss_last10": round(float(loss1), 4),
        "mrr": round(metrics["MRR"], 4), "hits10": round(metrics["HITS@10"], 4),
        "train_time_s": round(train_time, 2)}))


if __name__ == "__main__":
    main()
