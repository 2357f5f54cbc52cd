"""tools/test.py --num_devices N end-to-end (VERDICT r4 item 5): the
data-parallel eval CLI must produce the same result.json as the
single-device run — same recalls, same AP, same det count — on the
committed 24-scan synthetic KITTI val with the MGAF overfit config.

Runs the real CLI in subprocesses on a virtual CPU mesh (FV2P_PLATFORM),
exactly how a user would drive an 8-chip pod slice."""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_eval(extra_tag, num_devices):
    env = dict(os.environ, FV2P_PLATFORM='cpu:4')
    cmd = [sys.executable, 'test.py',
           '--cfg_file', 'cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd_overfit.yaml',
           '--batch_size', '4', '--workers', '0', '--dtype', 'float32',
           '--extra_tag', extra_tag]
    if num_devices > 1:
        cmd += ['--num_devices', str(num_devices)]
    out = subprocess.run(cmd, cwd=REPO / 'tools', env=env,
                         capture_output=True, text=True, timeout=3000)
    assert out.returncode == 0, out.stderr[-3000:]
    res = (REPO / 'output' / 'kitti_models' / 'MGAF-3DSSD'
           / 'mgaf-3dssd_overfit' / extra_tag / 'eval' / 'result.json')
    return json.loads(res.read_text())


@pytest.mark.slow
def test_num_devices_eval_matches_single_device(tmp_path):
    single = _run_eval('dp_eval_cli_1', 1)
    dp = _run_eval('dp_eval_cli_4', 4)
    for k in single:
        if k.startswith('sec_per_example'):
            continue
        assert abs(single[k] - dp[k]) < 1e-6, (k, single[k], dp[k])
    assert 'recall/rcnn_0.3' in single
