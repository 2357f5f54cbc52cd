"""Import machinery to run the PyTorch reference (/root/reference) on CPU as
a golden-parity oracle.

The reference's CUDA extension modules are not built in this environment and
some of its deps (numba, easydict, shapely, mmcv) are absent. This loader
imports reference *source files* unmodified by:

  * registering synthetic parent packages ('pcdet', 'pcdet.utils', ...) whose
    __path__ points at the real directories but whose __init__ bodies are NOT
    executed (avoids the detector-zoo import cascade and the CUDA extension
    imports living in package __init__ files);
  * seeding sys.modules with pure-Python stand-ins for unavailable deps:
    - numba: @jit/@cuda.jit become identity decorators, so the reference's
      numba-jitted functions (the official KITTI evaluator, the rotated-IoU
      geometry) run as plain Python;
    - easydict.EasyDict: attribute-access dict;
    - compiled extension leaves (iou3d_nms_cuda, roiaware_pool3d_cuda, ...):
      empty modules — wrapper functions that would call them are never
      invoked by the parity tests;
    - shapely: import-only stub (Polygon raises if actually used).

No reference file is modified; everything is read-only.
"""
import importlib
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REF_ROOT = Path('/root/reference')


def _identity_jit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]
    return lambda fn: fn


def _make_numba_stub():
    numba = types.ModuleType('numba')
    numba.jit = _identity_jit
    numba.njit = _identity_jit
    numba.prange = range
    numba.float32 = np.float32
    numba.float64 = np.float64
    numba.int32 = np.int32
    numba.int64 = np.int64
    numba.boolean = np.bool_

    cuda = types.ModuleType('numba.cuda')
    cuda.jit = _identity_jit

    class _Local:
        @staticmethod
        def array(shape, dtype):
            return np.zeros(shape, dtype=dtype)

    cuda.local = _Local
    numba.cuda = cuda
    return numba, cuda


def _make_easydict_stub():
    mod = types.ModuleType('easydict')

    class EasyDict(dict):
        def __init__(self, d=None, **kwargs):
            super().__init__()
            d = dict(d or {}, **kwargs)
            for k, v in d.items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            elif isinstance(v, (list, tuple)):
                v = type(v)(EasyDict(x) if isinstance(x, dict) else x
                            for x in v)
            super().__setitem__(k, v)
            super().__setattr__(k, v)

        __setattr__ = __setitem__

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

    mod.EasyDict = EasyDict
    return mod


def _make_shapely_stub():
    shapely = types.ModuleType('shapely')
    geometry = types.ModuleType('shapely.geometry')

    class Polygon:
        def __init__(self, *a, **k):
            raise RuntimeError('shapely stub: Polygon not available')

    geometry.Polygon = Polygon
    shapely.geometry = geometry
    return shapely, geometry


def _register_pkg(name, path):
    """Synthetic package: importable submodules via __path__, no __init__."""
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


_INSTALLED = False


def install():
    """Idempotently install all stubs + synthetic pcdet packages."""
    global _INSTALLED
    if _INSTALLED:
        return
    _INSTALLED = True

    if 'numba' not in sys.modules:
        numba, cuda = _make_numba_stub()
        sys.modules['numba'] = numba
        sys.modules['numba.cuda'] = cuda
    if 'easydict' not in sys.modules:
        sys.modules['easydict'] = _make_easydict_stub()
    if 'shapely' not in sys.modules:
        shapely, geometry = _make_shapely_stub()
        sys.modules['shapely'] = shapely
        sys.modules['shapely.geometry'] = geometry

    pc = REF_ROOT / 'pcdet'
    pkgs = {
        'pcdet': pc,
        'pcdet.utils': pc / 'utils',
        'pcdet.ops': pc / 'ops',
        'pcdet.ops.iou3d_nms': pc / 'ops/iou3d_nms',
        'pcdet.ops.roiaware_pool3d': pc / 'ops/roiaware_pool3d',
        'pcdet.ops.roipoint_pool3d': pc / 'ops/roipoint_pool3d',
        'pcdet.models': pc / 'models',
        'pcdet.models.model_utils': pc / 'models/model_utils',
        'pcdet.models.backbones_2d': pc / 'models/backbones_2d',
        'pcdet.models.dense_heads': pc / 'models/dense_heads',
        'pcdet.models.dense_heads.keypoint_assigner':
            pc / 'models/dense_heads/keypoint_assigner',
        'pcdet.models.dense_heads.feature_adaptor':
            pc / 'models/dense_heads/feature_adaptor',
        'pcdet.models.dense_heads.target_assigner':
            pc / 'models/dense_heads/target_assigner',
        'pcdet.models.roi_heads': pc / 'models/roi_heads',
        'pcdet.models.roi_heads.target_assigner':
            pc / 'models/roi_heads/target_assigner',
        'pcdet.models.backbones_3d': pc / 'models/backbones_3d',
        'pcdet.models.backbones_3d.pfe': pc / 'models/backbones_3d/pfe',
        'pcdet.models.backbones_2d.map_to_bev':
            pc / 'models/backbones_2d/map_to_bev',
        'pcdet.datasets': pc / 'datasets',
        'pcdet.datasets.kitti': pc / 'datasets/kitti',
        'pcdet.datasets.kitti.kitti_object_eval_python':
            pc / 'datasets/kitti/kitti_object_eval_python',
        'pcdet.datasets.processor': pc / 'datasets/processor',
        'pcdet.datasets.augmentor': pc / 'datasets/augmentor',
    }
    for name, path in pkgs.items():
        _register_pkg(name, path)

    # compiled extension leaves: empty stand-ins (never called by the tests)
    for leaf in ('pcdet.ops.iou3d_nms.iou3d_nms_cuda',
                 'pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda',
                 'pcdet.ops.roipoint_pool3d.roipoint_pool3d_cuda'):
        if leaf not in sys.modules:
            sys.modules[leaf] = types.ModuleType(leaf)

    # pcdet.ops.spconv: box_utils does `from pcdet.ops import spconv`; the
    # real __init__ imports the CUDA extension + mmcv. Provide a module with
    # just the SparseConvTensor structure (pure python, CPU-safe).
    if 'pcdet.ops.spconv' not in sys.modules:
        spconv_stub = types.ModuleType('pcdet.ops.spconv')

        class SparseConvTensor:  # used only as a type annotation there
            pass

        spconv_stub.SparseConvTensor = SparseConvTensor
        sys.modules['pcdet.ops.spconv'] = spconv_stub
        sys.modules['pcdet.ops'].spconv = spconv_stub


def load(name):
    """Import a reference module by dotted name, e.g.
    'pcdet.utils.box_coder_utils'. Parent packages are synthetic (no
    __init__ side effects)."""
    install()
    return importlib.import_module(name)
