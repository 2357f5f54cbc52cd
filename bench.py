"""End-to-end inference benchmark on the real TPU chip — both flagships.

MGAF-3DSSD KITTI Car (mgaf-3dssd.yaml) and FromVoxelToPoint (fv2p.yaml,
two-pass IoU-aligned RoI head), synthetic scans with surface-clustered
occupancy (~14k occupied voxels of the 0.05m grid, ground band + object
clusters like a real LiDAR scan), full pipeline: mean-VFE -> sparse
backbone -> BEV+DCN -> CenterAF decode -> rotated NMS (-> RoI refinement
for FV2P).

Prints exactly one JSON line; the primary metric is MGAF throughput and the
FV2P number rides along in the same object:
  {"metric": ..., "value": N, "unit": "scans/sec/chip", "vs_baseline": N,
   "fv2p_value": N, "fv2p_vs_baseline": N}

vs_baseline: the reference publishes no numbers at all (BASELINE.md:
"published": {}), so there is nothing measured to ratio against. We instead
normalize against the NORTH-STAR PER-CHIP TARGET from the driver's
BASELINE.json: "v5e-8 at >=5x A100 scans/sec". Assuming the CUDA reference
evals at ~20 scans/s on one A100 (batch-4 eval at ~50 ms/scan, in line with
OpenPCDet-class two-stage detectors; an estimate, documented in BASELINE.md
-- the reference emits only `sec_per_example` and never published a value),
the per-chip parity point is 5*20/8 = 12.5 scans/s. vs_baseline >= 1.0
therefore means the north-star throughput is met on this chip.
"""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

NORTH_STAR_SCANS_PER_SEC_PER_CHIP = 12.5  # see module docstring + BASELINE.md


def bench_model(ge, jax, jnp, cfg_path, n_points, batch_size=4, iters=10):
    cfg, model, variables, batch = ge._flagship(
        batch_size=batch_size, n_cap=16000, n_fill=14000,
        compute_dtype=jnp.bfloat16, cfg_path=cfg_path, n_points=n_points)
    batch.pop('gt_boxes')

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, dict(batch), train=False)
        return out['pred_boxes'], out['pred_scores'], out['pred_labels']

    def force(x):
        # axon's block_until_ready does not actually synchronize; a scalar
        # fetch is the only reliable completion barrier.
        return float(jnp.sum(x))

    # compile + warmup (also compiles the forcing sum)
    t0 = time.time()
    force(infer(variables, batch)[0])
    compile_s = time.time() - t0
    force(infer(variables, batch)[0])

    # steady state: device executes enqueued programs in order, so forcing
    # the last result bounds the whole loop.
    t0 = time.time()
    for _ in range(iters):
        boxes, scores, labels = infer(variables, batch)
    force(boxes)
    dt = (time.time() - t0) / iters
    return batch_size / dt, compile_s, dt / batch_size


def check_drift(name, ms):
    """Warn (stderr only) when steady-state drifts >10% from the committed
    expectation — an 18% MGAF regression shipped unnoticed in r4 because
    nothing guarded sec_per_example (VERDICT r4 weak #2)."""
    exp_path = REPO / 'artifacts' / 'bench_expected.json'
    if not exp_path.exists():
        return
    expected = json.loads(exp_path.read_text()).get(f'{name}_ms')
    if expected and abs(ms - expected) / expected > 0.10:
        print(f'# DRIFT WARNING: {name} sec_per_example {ms:.2f}ms is '
              f'{ms / expected:.2f}x the committed expectation '
              f'{expected:.2f}ms (artifacts/bench_expected.json)',
              file=sys.stderr)


def main():
    from fv2p_tpu.utils.compile_cache import (enable_persistent_cache,
                                              install_cache_read_retry,
                                              seed_from_committed)
    enable_persistent_cache()
    install_cache_read_retry()
    # tools/warm_bench_cache.py sets this so the scratch cache it harvests
    # holds EXACTLY the entries the bench programs produce — seeding first
    # would copy stale committed entries into the scratch and re-commit them
    if os.environ.get('FV2P_SKIP_CACHE_SEED'):
        print('# cache seeding skipped (FV2P_SKIP_CACHE_SEED)',
              file=sys.stderr)
    else:
        n = seed_from_committed()
        if n:
            print(f'# seeded {n} committed warm-cache entries',
                  file=sys.stderr)

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    mgaf_sps, mgaf_comp, mgaf_ms = bench_model(
        ge, jax, jnp, 'tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml',
        n_points=0)
    fv2p_sps, fv2p_comp, fv2p_ms = bench_model(
        ge, jax, jnp, 'tools/cfgs/kitti_models/FV2P/fv2p.yaml',
        n_points=18000)

    result = {
        'metric': 'mgaf3dssd_kitti_e2e_inference',
        'value': round(mgaf_sps, 3),
        'unit': 'scans/sec/chip',
        'vs_baseline': round(mgaf_sps / NORTH_STAR_SCANS_PER_SEC_PER_CHIP, 3),
        'fv2p_value': round(fv2p_sps, 3),
        'fv2p_vs_baseline': round(fv2p_sps / NORTH_STAR_SCANS_PER_SEC_PER_CHIP, 3),
    }
    check_drift('mgaf', mgaf_ms * 1000)
    check_drift('fv2p', fv2p_ms * 1000)
    print(json.dumps(result))
    print(f'# mgaf: compile={mgaf_comp:.1f}s sec_per_example={mgaf_ms*1000:.2f}ms | '
          f'fv2p: compile={fv2p_comp:.1f}s sec_per_example={fv2p_ms*1000:.2f}ms | '
          f'batch=4 device={jax.devices()[0].device_kind}', file=sys.stderr)


if __name__ == '__main__':
    # the axon tunnel intermittently kills the TPU worker on compile;
    # retry once in a fresh process before giving up
    import os
    import subprocess
    try:
        main()
    except Exception as e:
        print(f'# first attempt failed ({type(e).__name__}); retrying once',
              file=sys.stderr)
        if os.environ.get('FV2P_BENCH_RETRY') == '1':
            raise
        env = dict(os.environ, FV2P_BENCH_RETRY='1')
        time.sleep(120)
        sys.exit(subprocess.call([sys.executable, __file__], env=env))
