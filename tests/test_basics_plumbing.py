"""Train/eval plumbing tests (round-2): GNNChain kwarg threading,
WithGraph(traingraph=), reference_exact layer switches, normalize_graphdata.

Reference analogs: GraphNeuralNetworks/src/layers/basic.jl:40-52 (WithGraph),
:136-150 (_applylayer pass-through), GNNGraphs/src/utils.jl:126-170
(normalize_graphdata), GNNlib/src/layers/conv.jl:381-383 (gmm) / :705-723
(d_conv).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import models as M
from graphneuralnetworks_tpu.utils import normalize_graphdata


def _graph(n=20, e=60, d=6, seed=0):
    rng = np.random.default_rng(seed)
    return gnn.rand_graph(n, e, seed=seed, bidirected=True,
                          nodes={"x": rng.normal(size=(n, d))
                                 .astype(np.float32)})


def test_gnnchain_threads_deterministic_kwarg():
    g = _graph()
    chain = M.GNNChain(
        M.GCNConv(6, 8, jax.nn.relu, rngs=nnx.Rngs(0)),
        M.GATConv(8, 4, heads=2, dropout=0.5, rngs=nnx.Rngs(1)),
    )
    out_eval = chain(g, g.x, deterministic=True)
    out_eval2 = chain(g, g.x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_eval2))
    out_train = chain(g, g.x, deterministic=False)
    assert out_train.shape == out_eval.shape
    # dropout active -> differs from the deterministic pass
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval))
    # layers that don't take the kwarg (GCNConv, activations) are unaffected
    out_plain = chain(g, g.x)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_eval))


def test_gnnchain_threads_to_plain_callables_with_matching_sig():
    g = _graph()
    seen = {}

    def probe(x, *, deterministic=True):
        seen["det"] = deterministic
        return x

    chain = M.GNNChain(M.GCNConv(6, 6, rngs=nnx.Rngs(0)), probe)
    chain(g, g.x, deterministic=False)
    assert seen["det"] is False


def test_withgraph_explicit_graph_overrides():
    g = _graph(seed=1)
    g2 = _graph(seed=2)
    model = M.SAGEConv(6, 5, rngs=nnx.Rngs(0))
    wg = M.WithGraph(model, g)
    np.testing.assert_allclose(np.asarray(wg(g.x)),
                               np.asarray(model(g, g.x)))
    # feeding a new graph ignores the stored one (basic.jl:52)
    np.testing.assert_allclose(np.asarray(wg(g2, g2.x)),
                               np.asarray(model(g2, g2.x)))


def test_withgraph_traingraph_makes_features_trainable():
    g = _graph(seed=3)
    model = M.SAGEConv(6, 5, rngs=nnx.Rngs(0))

    wg_frozen = M.WithGraph(model, g, traingraph=False)
    wg_train = M.WithGraph(model, g, traingraph=True)

    def loss(m):
        return jnp.sum(m() ** 2)

    # traingraph=True exposes the node features as Params with gradients
    grads = nnx.grad(loss)(wg_train)
    gstate = nnx.state(grads)
    flat = {"/".join(map(str, path)): v
            for path, v in jax.tree_util.tree_leaves_with_path(
                nnx.to_pure_dict(gstate))}
    feat_grads = [v for k, v in flat.items() if "_nfeat" in k]
    assert feat_grads, f"no graph-feature grads in {list(flat)}"
    assert any(float(jnp.abs(v).sum()) > 0 for v in feat_grads)

    # traingraph=False: no graph-feature params exist
    grads_f = nnx.grad(loss)(wg_frozen)
    flat_f = {"/".join(map(str, path)): v
              for path, v in jax.tree_util.tree_leaves_with_path(
                  nnx.to_pure_dict(nnx.state(grads_f)))}
    assert not any("_nfeat" in k for k in flat_f)
    # both agree on the forward value
    np.testing.assert_allclose(np.asarray(wg_train()),
                               np.asarray(wg_frozen()), rtol=1e-6)


def test_gmmconv_reference_exact_flips_sign():
    g = _graph(seed=4)
    e = np.random.default_rng(4).normal(
        size=(g.e_pad, 2)).astype(np.float32)
    a = M.GMMConv(6, 5, edge_features=2, K=3, rngs=nnx.Rngs(0))
    b = M.GMMConv(6, 5, edge_features=2, K=3, reference_exact=True,
                  rngs=nnx.Rngs(0))
    oa = np.asarray(a(g, g.x, jnp.asarray(e)))
    ob = np.asarray(b(g, g.x, jnp.asarray(e)))
    assert oa.shape == ob.shape
    assert not np.allclose(oa, ob)
    # reference-exact kernel: exp(+1/2 sum(diff^2 sigma_inv^2)) — oracle
    mu = np.asarray(b.mu.value)
    si = np.asarray(b.sigma_inv.value)
    diff = e[:, None, :] - mu[None]
    w_ref = np.exp(0.5 * np.sum((diff * si[None]) ** 2, -1))
    diffk = np.exp(-0.5 * np.sum((diff * si[None]) ** 2, -1))
    assert not np.allclose(w_ref, diffk)


def test_dconv_reference_exact_runs_and_differs():
    g = _graph(seed=5)
    a = M.DConv(6, 5, k=3, rngs=nnx.Rngs(0))
    b = M.DConv(6, 5, k=3, reference_exact=True, rngs=nnx.Rngs(0))
    oa = np.asarray(a(g, g.x))
    ob = np.asarray(b(g, g.x))
    assert oa.shape == ob.shape
    assert np.all(np.isfinite(ob))
    assert not np.allclose(oa, ob)


def test_normalize_graphdata_semantics():
    # bare array -> named dict
    out = normalize_graphdata(np.ones((4, 2)), default_name="x", n=4)
    assert set(out) == {"x"}
    # n<=1 unsqueeze: global feature vector D -> [1, D]
    out = normalize_graphdata(np.arange(3.0), default_name="u", n=1)
    assert out["u"].shape == (1, 3)
    # duplicate_if_needed: n//2 rows doubled (undirected edge features)
    out = normalize_graphdata({"e": np.arange(6.0).reshape(3, 2)},
                              default_name="e", n=6,
                              duplicate_if_needed=True)
    assert out["e"].shape == (6, 2)
    np.testing.assert_array_equal(out["e"][:3], out["e"][3:])
    # wrong size raises
    with pytest.raises(ValueError, match="leading dimension"):
        normalize_graphdata(np.ones((5, 2)), default_name="x", n=4)


def test_rand_graph_duplicates_undirected_edge_features():
    ef = np.arange(8.0).reshape(4, 2).astype(np.float32)
    w = np.arange(4.0).astype(np.float32) + 1
    g = gnn.rand_graph(10, 8, seed=0, bidirected=True,
                       edges={"e": ef}, edge_weight=w)
    ne = int(g.num_edges)
    assert ne == 8
    # each undirected pair carries identical features in both directions
    s = np.asarray(g.senders)[:ne]
    r = np.asarray(g.receivers)[:ne]
    feats = np.asarray(g.edges["e"])[:ne]
    ws = np.asarray(g.edge_weight)[:ne]
    by_pair = {}
    for i in range(ne):
        key = (min(s[i], r[i]), max(s[i], r[i]))
        by_pair.setdefault(key, []).append((tuple(feats[i]), ws[i]))
    assert all(len(v) == 2 and v[0] == v[1] for v in by_pair.values())


def test_precision_wrapper_bf16():
    """models.Precision runs any layer/chain in bf16 with f32 master
    params: bf16 output tracking the f32 result, f32 parameter grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import graphneuralnetworks_tpu as gnn
    from graphneuralnetworks_tpu import models as M

    g = gnn.rand_graph(80, 400, seed=0, build_spmm_aux=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((g.n_pad, 8)), jnp.float32)
    inner = M.GNNChain(M.GCNConv(8, 16, jax.nn.relu, rngs=nnx.Rngs(0)),
                       M.GATConv(16, 4, heads=2, rngs=nnx.Rngs(1)))
    model = M.Precision(inner)
    y32 = inner(g, x)
    y16 = model(g, x)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y32),
                               np.asarray(y16.astype(jnp.float32)),
                               rtol=0.05, atol=0.05)
    gd, st = nnx.split(model)

    def loss(st):
        return jnp.sum(nnx.merge(gd, st)(g, x).astype(jnp.float32) ** 2)

    grads = jax.tree.leaves(jax.grad(loss)(st))
    assert all(l.dtype == jnp.float32 for l in grads)
    assert all(bool(jnp.isfinite(l).all()) for l in grads)
