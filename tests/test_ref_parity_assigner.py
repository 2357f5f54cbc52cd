"""Golden-parity A/B: our device-side CenterTargetAssigner vs the reference
CPU+cv2 assigner (keypoint_assigner/centertarget_assigner.py) running for
real on identical gt boxes.

hm / ind / mask / anno_box / xsys / src_box must match exactly (up to f32);
the segm / height rasters are cv2.fillPoly in the reference vs an analytic
convex-quad half-plane raster here, so they are compared up to a 1-pixel
boundary band (dilation/erosion bracket).
"""
import numpy as np
import torch

from tests import ref_loader

import jax.numpy as jnp

from fv2p_tpu.models.dense_heads.center_target_assigner import (
    CenterTargetAssigner)

ref_cta_mod = ref_loader.load(
    'pcdet.models.dense_heads.keypoint_assigner.centertarget_assigner')

VOXEL_SIZE = [0.05, 0.05, 0.1]
PC_RANGE = np.array([0., -40., -3., 70.4, 40., 1.], np.float32)


class _Cfg(dict):
    def __getattr__(self, k):
        return self[k]


def _model_cfg():
    tc = _Cfg(GAUSSIAN_MINOVERLAP=0.1, GAUSSIAN_MINRADIUS=2,
              FEATURE_MAP_STRIDE=8, MAX_OBJS=100)
    cfg = _Cfg(TARGET_ASSIGNER_CONFIG=tc)
    cfg.get = cfg.__getitem__  # EasyDict-ish
    return cfg


def _make_gt(rng, b, m, n_real):
    gt = np.zeros((b, m, 8), np.float32)
    for k in range(b):
        n = n_real[k]
        gt[k, :n, 0] = rng.uniform(2, 68, n)
        gt[k, :n, 1] = rng.uniform(-38, 38, n)
        gt[k, :n, 2] = rng.uniform(-2, 0.5, n)
        gt[k, :n, 3] = rng.uniform(2.5, 4.8, n)
        gt[k, :n, 4] = rng.uniform(1.4, 2.2, n)
        gt[k, :n, 5] = rng.uniform(1.3, 1.9, n)
        gt[k, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[k, :n, 7] = rng.randint(1, 2, n)           # class 1 (Car)
    return gt


def _run_reference(gt):
    cfg = _Cfg(TARGET_ASSIGNER_CONFIG=_Cfg(
        GAUSSIAN_MINOVERLAP=0.1, GAUSSIAN_MINRADIUS=2,
        FEATURE_MAP_STRIDE=8, MAX_OBJS=100))
    ref = ref_cta_mod.CenterTargetAssigner(
        model_cfg=cfg, voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
        class_names=['Car'])
    out = ref.assign_targets(torch.from_numpy(gt))
    return {k: v.numpy() if torch.is_tensor(v) else v for k, v in out.items()}


def _run_ours(gt):
    ours = CenterTargetAssigner(_model_cfg(), ['Car'], VOXEL_SIZE, PC_RANGE)
    out = ours.assign_targets(jnp.asarray(gt))
    return {k: np.asarray(v) for k, v in out.items()}


def _boundary_band(mask, iters=1):
    """Pixels within `iters` of the mask boundary (4-neighborhood)."""
    m = mask.astype(bool)
    dil, ero = m.copy(), m.copy()
    for _ in range(iters):
        d = dil.copy()
        d[1:] |= dil[:-1]; d[:-1] |= dil[1:]
        d[:, 1:] |= dil[:, :-1]; d[:, :-1] |= dil[:, 1:]
        dil = d
        e = ero.copy()
        e[1:] &= ero[:-1]; e[:-1] &= ero[1:]
        e[:, 1:] &= ero[:, :-1]; e[:, :-1] &= ero[:, 1:]
        ero = e
    return dil & ~ero


def test_center_target_assigner_matches_reference():
    rng = np.random.RandomState(0)
    b, m = 2, 12
    gt = _make_gt(rng, b, m, n_real=[9, 5])

    ref = _run_reference(gt)
    got = _run_ours(gt)

    # gather targets: exact
    np.testing.assert_array_equal(got['ind_target'][:, :m],
                                  ref['ind_target'][:, :m])
    np.testing.assert_array_equal(got['mask_target'][:, :m],
                                  ref['mask_target'][:, :m])
    np.testing.assert_allclose(got['anno_box_target'][:, :m],
                               ref['anno_box_target'][:, :m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got['xsys_target'][:, :m],
                               ref['xsys_target'][:, :m], atol=0)
    np.testing.assert_allclose(got['src_box_target'][:, :m],
                               ref['src_box_target'][:, :m],
                               rtol=1e-6, atol=1e-6)
    assert got['mask_target'][:, m:].sum() == 0

    # heatmap: ours is (B, H, W, C), reference (B, C, H, W); exact values
    hm_got = got['hm_target'].transpose(0, 3, 1, 2)
    np.testing.assert_allclose(hm_got, ref['hm_target'], rtol=1e-4, atol=1e-5)

    # segm / height: equal outside a 1-px boundary band of the reference mask
    segm_ref = ref['segm_target'][:, 0]                  # (B, H, W)
    segm_got = got['segm_target'][..., 0]
    h_ref = ref['height_target'][:, 0]
    h_got = got['height_target'][..., 0]
    for k in range(b):
        band = _boundary_band(segm_ref[k], iters=1)
        diff = segm_got[k] != segm_ref[k]
        assert not (diff & ~band).any(), (
            f'segm mismatch outside boundary band: {np.argwhere(diff & ~band)[:5]}')
        hdiff = ~np.isclose(h_got[k], h_ref[k], rtol=1e-5, atol=1e-5)
        assert not (hdiff & ~band).any()
        # and the bulk agrees
        agree = 1.0 - diff.mean()
        assert agree > 0.995, agree


def test_center_target_assigner_out_of_range_and_empty():
    """Objects whose rounded center falls outside the map are skipped entirely
    (reference :154-157 `continue`); an empty sample yields all-zero targets."""
    rng = np.random.RandomState(1)
    b, m = 2, 6
    gt = _make_gt(rng, b, m, n_real=[4, 0])
    gt[0, 0, 0] = 70.38                 # center rounds to x==fm_w -> skipped
    gt[0, 1, 1] = -39.99                # y edge: rounds to 0 -> kept

    ref = _run_reference(gt)
    got = _run_ours(gt)

    np.testing.assert_array_equal(got['mask_target'][:, :m],
                                  ref['mask_target'][:, :m])
    np.testing.assert_array_equal(got['ind_target'][:, :m],
                                  ref['ind_target'][:, :m])
    hm_got = got['hm_target'].transpose(0, 3, 1, 2)
    np.testing.assert_allclose(hm_got, ref['hm_target'], rtol=1e-4, atol=1e-5)
    assert got['mask_target'][1].sum() == 0
