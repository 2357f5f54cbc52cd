"""The TPU fast paths must actually ENGAGE under the bench configuration.

VERDICT r4 weak #1/#3: the fused-SA Pallas kernel was interpret-equivalence
tested but nothing asserted it was *selected* under the driver bench's
``compute_dtype=bfloat16`` build — and an over-strict dtype gate silently
dropped FV2P from 1.31x to 0.96x of the north star. These tests trace the
bench-shaped programs with ``jax.default_backend`` patched to 'tpu' (tracing
is backend-agnostic; lowering is not attempted) and assert each Pallas
dispatch fires:

- ``_SAModuleMSG._fused_ok`` returns True on the real fv2p.yaml RoI head
  built with compute_dtype=bfloat16 (and False for an explicit f32 build).
- ``pointops.farthest_point_sample_batch`` lowers to the Pallas FPS kernel.
- ``pointops.three_nn_interpolate`` lowers to the Pallas 3NN kernel.
- ``iou3d._overlap_matrix_tiled`` lowers to the Pallas rotated-IoU kernel.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fv2p_tpu.models.roi_heads import iouguided_roi_head as irh  # noqa: E402


@pytest.fixture
def tpu_backend(monkeypatch):
    # the backend decision is read INSIDE traced functions, so a jaxpr
    # traced here with the patched backend (containing Pallas calls) can be
    # served from jax's tracing caches to a later same-shape CPU test and
    # crash with 'Only interpret mode is supported on CPU backend' — flush
    # on both sides of the patch
    jax.clear_caches()
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    yield
    jax.clear_caches()


def _bench_shaped_fv2p(compute_dtype):
    """Real fv2p.yaml topology at bench caps; abstract (eval_shape) only."""
    import __graft_entry__ as ge
    from fv2p_tpu.config import EasyDict, cfg_from_yaml_file
    from fv2p_tpu.datasets import dataset_meta_from_cfg
    from fv2p_tpu.models import build_network

    cfg = EasyDict()
    cfg_from_yaml_file(
        str(REPO / 'tools/cfgs/kitti_models/FV2P/fv2p.yaml'), cfg)
    meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'train')
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          class_names=cfg.CLASS_NAMES, dataset_meta=meta,
                          compute_dtype=compute_dtype)
    batch = ge._synthetic_batch(meta, batch_size=1, n_cap=16000, n_fill=64,
                                host_rulebooks=True,
                                backbone=cfg.MODEL.BACKBONE_3D.NAME,
                                n_points=18000, clustered=False)
    return model, batch


def _trace_fused_decisions(model, batch, monkeypatch):
    """eval_shape the eval-mode apply, spying on _fused_ok decisions."""
    decisions = []
    orig = irh._SAModuleMSG._fused_ok

    def spy(self):
        out = orig(self)
        decisions.append(out)
        return out

    monkeypatch.setattr(irh._SAModuleMSG, '_fused_ok', spy)
    var_shapes = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False), batch)
    jax.eval_shape(lambda v, b: model.apply(v, dict(b), train=False),
                   var_shapes, batch)
    return decisions


@pytest.mark.slow
def test_fused_sa_engages_on_bench_bf16_build(tpu_backend, monkeypatch):
    model, batch = _bench_shaped_fv2p(jnp.bfloat16)
    decisions = _trace_fused_decisions(model, batch, monkeypatch)
    assert decisions, 'SA module never consulted _fused_ok'
    assert all(use for use, _ in decisions), decisions
    assert all(not interp for _, interp in decisions), decisions


@pytest.mark.slow
def test_fused_sa_stays_off_for_explicit_f32(tpu_backend, monkeypatch):
    model, batch = _bench_shaped_fv2p(None)   # f32 numerics build
    decisions = _trace_fused_decisions(model, batch, monkeypatch)
    assert decisions, 'SA module never consulted _fused_ok'
    assert all(not use for use, _ in decisions), decisions


def _jaxpr_has_pallas(jaxpr, needle):
    txt = str(jaxpr)
    return 'pallas_call' in txt and needle in txt


def test_pallas_fps_engages(tpu_backend):
    from fv2p_tpu.ops import pointops
    pts = jax.ShapeDtypeStruct((2, 4096, 3), jnp.float32)
    valid = jax.ShapeDtypeStruct((2, 4096), jnp.bool_)
    jaxpr = jax.make_jaxpr(
        lambda p, v: pointops.farthest_point_sample_batch(p, v, 256))(
        pts, valid)
    assert _jaxpr_has_pallas(jaxpr, 'fps'), str(jaxpr)[:2000]


def test_pallas_three_nn_engages(tpu_backend):
    from fv2p_tpu.ops import pointops
    src = jax.ShapeDtypeStruct((4096, 3), jnp.float32)
    sv = jax.ShapeDtypeStruct((4096,), jnp.bool_)
    feats = jax.ShapeDtypeStruct((4096, 16), jnp.float32)
    q = jax.ShapeDtypeStruct((2048, 3), jnp.float32)
    jaxpr = jax.make_jaxpr(pointops.three_nn_interpolate)(src, sv, feats, q)
    assert _jaxpr_has_pallas(jaxpr, 'three_nn'), str(jaxpr)[:2000]


def test_pallas_rotated_iou_engages(tpu_backend):
    from fv2p_tpu.utils import iou3d
    boxes = jax.ShapeDtypeStruct((512, 7), jnp.float32)
    scores = jax.ShapeDtypeStruct((512,), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda b, s: iou3d.nms_rotated(b, s, 0.7, pre_max=512, post_max=100))(
        boxes, scores)
    txt = str(jaxpr)
    assert 'pallas_call' in txt, txt[:2000]
