"""Fused Pallas SA (group+MLP+maxpool, ops/pallas/sa_group.py) must match
the XLA ball_query_group + _MLP1x1 + max path bit-closely. Runs the kernel
in interpret mode on CPU (monkeypatching the import-time
_FUSED_SA_MODE switch; the env var itself is read once at import)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fv2p_tpu.models.roi_heads.iouguided_roi_head as igrh
from fv2p_tpu.models.roi_heads.iouguided_roi_head import _SAModuleMSG

RADII = (0.8, 1.6)
NSAMPLES = (16, 32)
MLPS = ((64, 64), (64, 64))


def _data(seed=0, r=3, p=64, g=27, c=32):
    """Random point sets whose center-point distances stay clear of the
    ball boundaries: the fused kernel computes d2 with a different f32
    reassociation than the XLA path, so a pair within float rounding of
    radius^2 could legitimately flip in/out of the ball and change the
    first-k selection. Retry seeds until every pair has a safe margin."""
    for s in range(seed, seed + 50):
        rng = np.random.RandomState(s)
        xyz = rng.randn(r, p, 3).astype(np.float32)
        valid = rng.rand(r, p) < 0.9
        feats = rng.randn(r, p, c).astype(np.float32)
        centers = rng.randn(r, g, 3).astype(np.float32) * 0.7
        d2 = ((centers[:, :, None, :].astype(np.float64)
               - xyz[:, None, :, :]) ** 2).sum(-1)
        gap = min(np.abs(d2 - rad * rad).min() for rad in RADII)
        if gap > 1e-4:
            return (jnp.asarray(xyz), jnp.asarray(valid),
                    jnp.asarray(feats), jnp.asarray(centers))
    raise AssertionError('no boundary-safe seed found')


@pytest.mark.parametrize('use_bn', [False, True])
def test_fused_matches_xla(use_bn, monkeypatch):
    xyz, valid, feats, centers = _data()
    mod = _SAModuleMSG(RADII, NSAMPLES, MLPS, use_bn=use_bn)
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, valid, feats, centers,
                     train=True)
    if use_bn:
        # make running stats nontrivial so BN folding is actually exercised
        vars_ = jax.tree_util.tree_map(lambda x: x, vars_)
        bs = jax.tree_util.tree_map(
            lambda x: x + jnp.linspace(0.1, 0.5, x.shape[-1]), vars_['batch_stats'])
        vars_ = {'params': vars_['params'], 'batch_stats': bs}

    monkeypatch.setattr(igrh, '_FUSED_SA_MODE', '0')
    ref = mod.apply(vars_, xyz, valid, feats, centers, train=False)

    monkeypatch.setattr(igrh, '_FUSED_SA_MODE', 'interpret')
    fused = mod.apply(vars_, xyz, valid, feats, centers, train=False)

    assert fused.shape == ref.shape == (3, 27, 128)
    # fused accumulates layer 1 in f32 over a different order and runs the
    # matmuls in bf16 — tolerance sized for bf16 mantissa on O(10) values
    err = np.abs(np.asarray(fused, np.float32) - np.asarray(ref, np.float32))
    scale = np.maximum(np.abs(np.asarray(ref, np.float32)), 1.0)
    assert (err / scale).max() < 0.05, (err.max(), (err / scale).max())


def test_fused_empty_ball_semantics(monkeypatch):
    """Centers far from every point: fused must reproduce the XLA path's
    zero-row convention (grouped=0 => rel_xyz=-center through the MLP)."""
    xyz, valid, feats, _ = _data(seed=1)
    centers = jnp.full((3, 9, 3), 50.0)
    mod = _SAModuleMSG(RADII, NSAMPLES, MLPS, use_bn=False)
    vars_ = mod.init(jax.random.PRNGKey(1), xyz, valid, feats, centers,
                     train=True)
    monkeypatch.setattr(igrh, '_FUSED_SA_MODE', '0')
    ref = mod.apply(vars_, xyz, valid, feats, centers, train=False)
    monkeypatch.setattr(igrh, '_FUSED_SA_MODE', 'interpret')
    fused = mod.apply(vars_, xyz, valid, feats, centers, train=False)
    err = np.abs(np.asarray(fused, np.float32) - np.asarray(ref, np.float32))
    scale = np.maximum(np.abs(np.asarray(ref, np.float32)), 1.0)
    assert (err / scale).max() < 0.05


def test_train_path_unchanged():
    """Training still uses the differentiable XLA path regardless of env."""
    xyz, valid, feats, centers = _data(seed=2)
    mod = _SAModuleMSG(RADII, NSAMPLES, MLPS, use_bn=False)
    vars_ = mod.init(jax.random.PRNGKey(2), xyz, valid, feats, centers,
                     train=True)

    def loss(p):
        out = mod.apply({'params': p}, xyz, valid, feats, centers, train=True)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vars_['params'])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
