"""Training-step benchmark on the real TPU (fwd+bwd+optimizer, bf16 compute,
f32 params). One jitted step on synthetic data at flagship shapes."""
import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', choices=['mgaf', 'fv2p'], default='mgaf')
    parser.add_argument('--batch_size', type=int, default=4)
    parser.add_argument('--out', type=str, default=None,
                        help='write a JSON artifact with the measured numbers')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from fv2p_tpu.config import EasyDict
    from fv2p_tpu.train_utils.optimization import build_optimizer
    from fv2p_tpu.train_utils.train_state import (create_train_state,
                                                  make_train_step)

    if args.model == 'fv2p':
        cfg_path = 'tools/cfgs/kitti_models/FV2P/fv2p.yaml'
        n_points = 18000
    else:
        cfg_path = 'tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml'
        n_points = 0

    cfg, model, _, batch = ge._flagship(
        batch_size=args.batch_size, n_cap=16000, n_fill=14000,
        compute_dtype=jnp.bfloat16, cfg_path=cfg_path, n_points=n_points)

    rngs = {'params': jax.random.PRNGKey(0),
            'sampling': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    init_fn = jax.jit(lambda r, b: model.init(r, b, train=True))
    variables = init_fn(rngs, dict(batch))
    tx = build_optimizer(cfg.OPTIMIZATION, 1000)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model))

    t0 = time.time()
    state, metrics = step(state, dict(batch))
    loss = float(metrics['loss'])
    print('# compile+first step: %.1fs loss=%.3f' % (time.time() - t0, loss))

    state, metrics = step(state, dict(batch))
    float(metrics['loss'])
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, dict(batch))
    loss = float(metrics['loss'])        # scalar fetch = sync barrier
    dt = (time.time() - t0) / iters
    print('%s train step: %.0f ms (batch %d, %.2f scans/s/chip), loss %.3f'
          % (args.model, dt * 1e3, args.batch_size,
             args.batch_size / dt, loss))
    if args.out:
        import json
        with open(args.out, 'w') as f:
            json.dump({'model': args.model, 'batch_size': args.batch_size,
                       'step_ms': round(dt * 1e3, 1),
                       'scans_per_sec_per_chip': round(args.batch_size / dt, 2),
                       'loss': round(loss, 4),
                       'device': str(jax.devices()[0])}, f, indent=2)
            f.write('\n')


if __name__ == '__main__':
    main()
