"""Full-graph node-classification training harness.

Counterpart of the reference's example training loops
(examples/pytorch/gcn/train.py etc.), expressed as one jitted train step:
forward + masked cross-entropy + adam update all fuse into a single XLA
computation per epoch — the graph rides through the step as a pytree.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.graph import Graph

Array = jax.Array


def masked_cross_entropy(logits: Array, labels: Array, mask: Array) -> Array:
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    m = mask.astype(logits.dtype)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def masked_accuracy(logits: Array, labels: Array, mask: Array) -> Array:
    pred = logits.argmax(-1)
    ok = (pred == labels).astype(jnp.float32) * mask
    return ok.sum() / jnp.maximum(mask.sum(), 1.0)


def train_node_classifier(model, g: Graph, feats, labels, train_mask,
                          val_mask, test_mask, *, num_epochs: int = 200,
                          lr: float = 1e-2, weight_decay: float = 5e-4,
                          seed: int = 0, model_args: tuple = (),
                          model_kwargs: dict = None,
                          log_every: int = 0,
                          early_stop_patience: int = 0) -> Dict[str, Any]:
    """Returns dict with params, accuracies and epoch timing."""
    model_kwargs = model_kwargs or {}
    feats = None if feats is None else jnp.asarray(feats)
    labels = jnp.asarray(labels)
    train_mask = jnp.asarray(train_mask)
    val_mask = jnp.asarray(val_mask)
    test_mask = jnp.asarray(test_mask)

    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key}, g, *model_args,
                        feats, **model_kwargs)
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        def loss_fn(p):
            logits = model.apply(p, g, *model_args, feats,
                                 deterministic=False,
                                 rngs={"dropout": key}, **model_kwargs)
            return masked_cross_entropy(logits, labels, train_mask)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, g, *model_args, feats,
                             **model_kwargs)
        return (masked_accuracy(logits, labels, train_mask),
                masked_accuracy(logits, labels, val_mask),
                masked_accuracy(logits, labels, test_mask))

    best_val, best_test, patience = 0.0, 0.0, 0
    # warm-up compile outside the timed region
    params, opt_state, loss = train_step(params, opt_state, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for epoch in range(1, num_epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub)
        if log_every and epoch % log_every == 0:
            tr, va, te = evaluate(params)
            print(f"epoch {epoch:4d} loss {float(loss):.4f} "
                  f"train {float(tr):.4f} val {float(va):.4f} "
                  f"test {float(te):.4f}")
        if early_stop_patience:
            _, va, te = evaluate(params)
            if float(va) > best_val:
                best_val, best_test, patience = float(va), float(te), 0
            else:
                patience += 1
                if patience >= early_stop_patience:
                    break
    jax.block_until_ready(loss)
    train_time = time.perf_counter() - t0

    tr, va, te = evaluate(params)
    return {"params": params,
            "train_acc": float(tr), "val_acc": float(va),
            "test_acc": float(te),
            "best_test_acc": best_test if early_stop_patience else float(te),
            "train_time_s": train_time,
            "epochs_per_s": (num_epochs - 1) / max(train_time, 1e-9)}
