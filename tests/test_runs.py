"""Tests for ops/runs.py piecewise structured gathers.

Semantics under test: ``run_gather(src, build_run_meta(p, ...)) == src[p]``
with 0 at dummy positions, for both incrementing-run and constant-run
(broadcast) modes, scalar and row sources, ragged lengths, and the K-cap
fallback. (GATHER_STUDY.md p10 records which modes are fast on TPU; both
must be *correct* everywhere.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from graphneuralnetworks_tpu.ops.runs import build_run_meta, run_gather


def _piecewise_perm(rng, m, src_len, dummy_frac=0.25):
    p = np.empty(m, np.int64)
    i = 0
    while i < m:
        ln = min(int(rng.integers(1, 60)), m - i)
        if rng.random() < dummy_frac:
            p[i:i + ln] = src_len
        else:
            start = int(rng.integers(0, src_len - ln))
            p[i:i + ln] = start + np.arange(ln)
        i += ln
    return p


@pytest.mark.parametrize("ch", [8, 32, 128])
def test_run_mode_scalar_and_rows(ch):
    rng = np.random.default_rng(0)
    m, src_len = 1000, 1700
    p = _piecewise_perm(rng, m, src_len)
    meta = build_run_meta(p, ch=ch, dummy_idx=src_len)
    assert meta is not None

    src = rng.standard_normal(src_len).astype(np.float32)
    out = run_gather(jnp.asarray(src), meta)
    ref = np.where(p == src_len, 0.0, src[np.minimum(p, src_len - 1)])
    np.testing.assert_allclose(np.asarray(out), ref)

    src2 = rng.standard_normal((src_len, 7)).astype(np.float32)
    out2 = run_gather(jnp.asarray(src2), meta)
    ref2 = np.where((p == src_len)[:, None], 0.0,
                    src2[np.minimum(p, src_len - 1)])
    np.testing.assert_allclose(np.asarray(out2), ref2)


@pytest.mark.parametrize("ch", [8, 32, 128])
def test_const_mode(ch):
    rng = np.random.default_rng(1)
    recv = np.sort(rng.integers(0, 50, size=1000))
    meta = build_run_meta(recv, ch=ch, const=True)
    assert meta is not None
    src = rng.standard_normal((50, 5)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(run_gather(jnp.asarray(src), meta)), src[recv])
    np.testing.assert_allclose(
        np.asarray(run_gather(jnp.asarray(src[:, 0]), meta)), src[recv, 0])


def test_const_mode_with_dummies():
    rng = np.random.default_rng(2)
    recv = np.sort(rng.integers(0, 20, size=256)).astype(np.int64)
    recv[200:] = 20  # padded edges point one past the end
    meta = build_run_meta(recv, ch=64, const=True, dummy_idx=20)
    src = rng.standard_normal((20, 3)).astype(np.float32)
    out = np.asarray(run_gather(jnp.asarray(src), meta))
    np.testing.assert_allclose(out[:200], src[recv[:200]])
    np.testing.assert_allclose(out[200:], 0.0)


def test_k_cap_fallback_and_ragged():
    rng = np.random.default_rng(3)
    assert build_run_meta(rng.integers(0, 1700, size=1000),
                          ch=128, k_cap=8) is None
    p = _piecewise_perm(rng, 37, 500)
    meta = build_run_meta(p, ch=16, dummy_idx=500)
    src = rng.standard_normal(500).astype(np.float32)
    out = np.asarray(run_gather(jnp.asarray(src), meta))
    assert out.shape == (37,)
    ref = np.where(p == 500, 0.0, src[np.minimum(p, 499)])
    np.testing.assert_allclose(out, ref)


def test_empty():
    assert build_run_meta(np.zeros((0,), np.int64), ch=8) is None
