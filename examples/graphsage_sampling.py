"""Large-graph GraphSAGE with neighbor-sampled minibatches.

Reference analog: the ogbn-products GraphSAGE recipe (BASELINE.md target) /
NeighborLoader usage (GNNGraphs/src/samplers.jl:28-105). Zero-egress sandbox:
runs on a large synthetic homophilous graph; the loader emits fixed-shape
batches so the train step compiles once, and the C++ sampler keeps the host
ahead of the device.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import models as M
from graphneuralnetworks_tpu.sampling import NeighborLoader
from graphneuralnetworks_tpu.training import TrainState, make_train_step


def big_synthetic(n=50_000, avg_deg=10, classes=16, d=64, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, classes, n)
    m = n * avg_deg // 2
    src = rng.integers(0, n, 3 * m)
    dst = rng.integers(0, n, 3 * m)
    keep = (y[src] == y[dst]) | (rng.random(3 * m) < 0.15)
    src, dst = src[keep][:m], dst[keep][:m]
    proto = rng.standard_normal((classes, d)).astype(np.float32)
    x = proto[y] + 0.8 * rng.standard_normal((n, d)).astype(np.float32)
    s = np.concatenate([src, dst])
    r = np.concatenate([dst, src])
    return gnn.graph(s, r, num_nodes=n,
                     nodes={"x": x, "y": y.astype(np.int32)}), classes


def run_device_sampled(g, n_classes, args):
    """TPU-native variant: sampling runs ON-device (DeviceSampler), the
    whole epoch is one dispatch, per-hop trimmed blocks (apply_blocks).
    See docs/tutorial_sampled_training.md and bench.py:_run_sage_device."""
    import functools

    from graphneuralnetworks_tpu.device_sampler import DeviceSampler

    n = int(g.num_nodes)
    ne = int(g.num_edges)
    s = np.asarray(g.senders)[:ne]
    r = np.asarray(g.receivers)[:ne]
    order = np.argsort(r, kind="stable")
    ptr = np.concatenate([[0], np.cumsum(np.bincount(r, minlength=n))])
    sampler = DeviceSampler.build(s[order], ptr, fanouts=tuple(args.fanout),
                                  batch_size=args.batch_size)
    X = jax.device_put(g.nodes["x"][:n])
    y = jax.device_put(g.nodes["y"][:n].astype(jnp.int32))
    x_dim = X.shape[1]
    rngs = nnx.Rngs(0)
    convs = [M.SAGEConv(x_dim, 128, jax.nn.relu, rngs=rngs),
             M.SAGEConv(128, 128, jax.nn.relu, rngs=rngs)]
    head = nnx.Linear(128, n_classes, rngs=rngs)
    box = M.GNNChain(*convs, head)         # one state pytree for all parts
    gd, state = nnx.split(box)
    tx = optax.adam(1e-3)
    opt_state = tx.init(state)
    bs = args.batch_size
    nb = max(1, n // bs)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(state, opt_state, sampler, key, seeds_all, X, y):
        def body(i, carry):
            state, opt_state, _ = carry

            def loss_fn(st):
                ls_ = list(nnx.merge(gd, st).layers)
                blocks, nid = sampler.sample_blocks(
                    jax.random.fold_in(key, i), seeds_all[i])
                x = gnn.apply_blocks(blocks, ls_[:-1], X[nid])
                logits = ls_[-1](x[:bs])
                return jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits, y[nid[:bs]]))

            loss, grads = jax.value_and_grad(loss_fn)(state)
            upd, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(state, upd), opt_state, loss

        return jax.lax.fori_loop(0, nb, body,
                                 (state, opt_state, jnp.float32(0)))

    rng = np.random.default_rng(1)
    for ep in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        seeds = jnp.asarray(
            rng.choice(n, (nb, bs), replace=True), jnp.int32)
        state, opt_state, loss = epoch(state, opt_state, sampler,
                                       jax.random.key(ep), seeds, X, y)
        lv = float(loss)                   # fetch = epoch done
        dt = time.perf_counter() - t0
        print(f"epoch {ep}: {dt:.1f}s ({nb * sampler.e_total / dt / 1e6:.2f}"
              f" M sampled edges/s, zero host traffic)  loss {lv:.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--fanout", type=int, nargs="+", default=[10, 10])
    ap.add_argument("--nodes", type=int, default=50_000)
    ap.add_argument("--device-sampler", action="store_true",
                    help="sample ON the TPU (DeviceSampler + blocks)")
    args = ap.parse_args()

    g, n_classes = big_synthetic(args.nodes)
    x_dim = g.nodes["x"].shape[-1]
    print(f"graph {g}")

    if args.device_sampler:
        return run_device_sampled(g, n_classes, args)

    # Pallas kernels pay off on TPU; in CPU interpret mode they simulate the
    # grid step-by-step, so only build the grouping on a real TPU backend.
    loader = NeighborLoader(g, num_neighbors=args.fanout,
                            batch_size=args.batch_size, seed=0,
                            build_spmm_aux=jax.default_backend() == "tpu")
    print(f"loader: {len(loader)} batches/epoch, "
          f"n_pad={loader.n_pad} e_pad={loader.e_pad}")

    rngs = nnx.Rngs(0)
    model = M.GNNChain(
        M.SAGEConv(x_dim, 128, jax.nn.relu, rngs=rngs),
        M.SAGEConv(128, 128, jax.nn.relu, rngs=rngs),
        nnx.Linear(128, n_classes, rngs=rngs),
    )
    state = TrainState(model, optax.adam(1e-3))

    def loss_fn(m, gb):
        logits = m(gb, gb.nodes["x"])
        y = gb.nodes["y"]
        mask = gb.nodes["seed_mask"] & gb.node_mask
        ls = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(ls, y[:, None].astype(jnp.int32),
                                   axis=-1)[:, 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    step = make_train_step(state, loss_fn)
    params, opt_state = state.params, state.opt_state

    @jax.jit
    def acc_fn(params, gb):
        m = state.model(params)
        pred = jnp.argmax(m(gb, gb.nodes["x"]), -1)
        mask = gb.nodes["seed_mask"] & gb.node_mask
        return (jnp.sum((pred == gb.nodes["y"]) * mask), jnp.sum(mask))

    for epoch in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        n_batches = 0
        for gb in loader:
            params, opt_state, loss = step(params, opt_state, gb)
            n_batches += 1
        jax.block_until_ready(params)
        dt = time.perf_counter() - t0
        c = t = 0.0
        for i, gb in enumerate(loader):
            ci, ti = acc_fn(params, gb)
            c += float(ci)
            t += float(ti)
            if i >= 10:
                break
        print(f"epoch {epoch}: {dt:.1f}s "
              f"({n_batches * loader.e_pad / dt / 1e6:.2f} M sampled "
              f"edges/s incl. host)  loss {float(loss):.3f}  "
              f"train acc {c / max(t, 1):.3f}")


if __name__ == "__main__":
    main()
