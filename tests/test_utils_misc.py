"""Tests for metric utilities (misc.py) and BEV map visualization helpers."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))

from eval_utils.mapvisulize_utils import featuremap_to_greymap, greymap_to_rgbimg
from fv2p_tpu.utils.misc import MetricLogger, SmoothedValue, all_gather, reduce_dict


def test_smoothed_value():
    sv = SmoothedValue(window_size=4)
    for i in range(10):
        sv.update(float(i))
    assert sv.value == 9.0
    assert sv.max == 9.0
    assert sv.avg == np.mean([6, 7, 8, 9])
    assert sv.global_avg == 4.5
    sv.synchronize_between_processes()  # single-process no-op
    assert sv.global_avg == 4.5


def test_metric_logger():
    ml = MetricLogger()
    ml.update(loss=2.0, acc=0.5)
    ml.update(loss=1.0, acc=0.7)
    assert abs(ml.loss.avg - 1.5) < 1e-9
    assert 'loss' in str(ml) and 'acc' in str(ml)
    seen = list(ml.log_every(range(5), print_freq=10))
    assert seen == list(range(5))


def test_single_process_collectives():
    assert all_gather({'k': 3}) == [{'k': 3}]
    out = reduce_dict({'a': 1.0, 'b': 2.0})
    assert out == {'a': 1.0, 'b': 2.0}


def test_featuremap_to_greymap():
    fm = np.random.RandomState(0).rand(8, 16, 24).astype(np.float32)
    g = featuremap_to_greymap(fm)
    assert g.shape == (16, 24)
    assert g.min() >= 0.0 and abs(g.max() - 1.0) < 1e-6
    # batched input gives the same result
    g2 = featuremap_to_greymap(fm[None])
    np.testing.assert_allclose(g, g2, rtol=1e-6)


def test_greymap_to_rgbimg():
    g = np.linspace(0, 1, 12 * 10).reshape(12, 10)
    img = greymap_to_rgbimg(g)
    assert img.shape == (12, 10, 3) and img.dtype == np.uint8
    chw = greymap_to_rgbimg(g, CHW_format=True)
    assert chw.shape == (3, 12, 10)
    bg = np.full((12, 10, 3), 255.0)
    blended = greymap_to_rgbimg(g, background=bg, background_ratio=0.2)
    assert blended.max() <= 255
