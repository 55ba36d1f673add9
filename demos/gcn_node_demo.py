#!/usr/bin/env python
"""GCN node-classification demo on a synthetic citation-style graph.

Equivalent of the reference's vendored Cora demo (`modules/pygcn/train.py`,
SURVEY.md 2.8): exercises the GraphConvolution layer + dense adjacency ops on
a generated stochastic-block-model graph (3 communities).

Usage: python demos/gcn_node_demo.py [--steps 100]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--nodes", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from garment4d_tpu.nn import GraphConvolution
    from garment4d_tpu.ops import row_normalize

    rng = np.random.RandomState(0)
    n, k = args.nodes, 3
    labels = rng.randint(0, k, n)
    # stochastic block model: intra 0.1, inter 0.01
    p = np.where(labels[:, None] == labels[None, :], 0.1, 0.01)
    adj = (rng.rand(n, n) < p).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 0)
    norm_adj = row_normalize(adj + np.eye(n, dtype=np.float32))
    feats = np.eye(n, dtype=np.float32) + rng.randn(n, n).astype(np.float32) * 0.01

    class GCN(nn.Module):
        @nn.compact
        def __call__(self, x, a):
            x = jax.nn.relu(GraphConvolution(32, name="gc1")(x, a))
            return GraphConvolution(k, name="gc2")(x, a)

    model = GCN()
    x = jnp.asarray(feats)[None]
    a = jnp.asarray(norm_adj)
    y = jnp.asarray(labels)
    params = model.init(jax.random.PRNGKey(0), x, a)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, a)[0]
            logp = jax.nn.log_softmax(logits)
            loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1))
            acc = jnp.mean(jnp.argmax(logits, -1) == y)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    for i in range(args.steps):
        params, opt_state, loss, acc = step(params, opt_state)
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}  acc {float(acc):.3f}")
    assert float(acc) > 0.9, "demo should fit the SBM communities"
    print("OK")


if __name__ == "__main__":
    main()
