"""Training entry point (reference ``tools/train.py``): yaml config + argparse
surface, auto-resume from the newest checkpoint, epoch loop with per-iter LR
schedule, checkpoint rotation — re-expressed over the jitted JAX train step
and a data-parallel device mesh."""
import argparse
import datetime
import glob
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_config():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, default=None,
                        help='specify the config for training')
    parser.add_argument('--batch_size', type=int, default=None, required=False,
                        help='batch size for training')
    parser.add_argument('--epochs', type=int, default=None, required=False)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--pretrained_model', type=str, default=None)
    parser.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER,
                        help='set extra config keys if needed')
    parser.add_argument('--max_ckpt_save_num', type=int, default=30)
    parser.add_argument('--ckpt_save_interval', type=int, default=1,
                        help='save a checkpoint every N epochs '
                             '(reference train.py:35)')
    parser.add_argument('--profile_steps', type=str, default=None,
                        help='"START,END": capture a jax.profiler trace of these '
                             'global steps into <output_dir>/profile')
    parser.add_argument('--eval_after_train', action='store_true', default=False,
                        help='evaluate the last --num_epochs_to_eval checkpoints '
                             'after training (reference train.py:200-216)')
    parser.add_argument('--num_epochs_to_eval', type=int, default=10)
    parser.add_argument('--fix_random_seed', action='store_true', default=False)
    parser.add_argument('--dist', action='store_true', default=False,
                        help='multi-host: jax.distributed.initialize()')
    parser.add_argument('--num_devices', type=int, default=None,
                        help='data-parallel devices (default: all)')
    parser.add_argument('--rulebooks', choices=['host', 'device'],
                        default=os.environ.get('FV2P_RULEBOOKS', 'host'),
                        help='where sparse-conv rulebooks are built: "host" '
                             'ships precomputed tables from dataloader '
                             'workers (fastest when host<->device bandwidth '
                             'is plentiful); "device" builds them inside the '
                             'jitted step from (cap, 3) coords only — '
                             '~100x less host->HBM traffic per batch')
    parser.add_argument('--max_rss_gb', type=float,
                        default=float(os.environ.get('FV2P_MAX_RSS_GB', '48')),
                        help='host-RSS watchdog: when process RSS exceeds '
                             'this at an epoch boundary, save a checkpoint '
                             'and re-exec the process (auto-resume continues '
                             'training). Works around the per-transfer host '
                             'buffer leak in the remote-TPU PJRT client '
                             '(see README Known issues). 0 disables.')
    args = parser.parse_args()

    from fv2p_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()
    from fv2p_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from fv2p_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from fv2p_tpu.config import log_config_to_file
    from fv2p_tpu.datasets import dataset_meta_from_cfg
    from fv2p_tpu.datasets import build_dataset
    from fv2p_tpu.models import build_network
    from fv2p_tpu.parallel import make_dp_train_step, make_mesh, shard_batch
    from fv2p_tpu.train_utils.optimization import build_optimizer
    from fv2p_tpu.train_utils.train_state import create_train_state, make_train_step
    from fv2p_tpu.utils import common_utils

    if args.dist:
        # multi-host data parallelism over DCN/ICI (north-star scale-out;
        # replaces the reference's torch.distributed.launch + NCCL DDP).
        # On TPU pods initialize() auto-discovers the coordinator; off-pod
        # the dist_train.sh env contract supplies it explicitly.
        if os.environ.get('JAX_COORDINATOR_ADDRESS'):
            jax.distributed.initialize(
                coordinator_address=os.environ['JAX_COORDINATOR_ADDRESS'],
                num_processes=int(os.environ['JAX_NUM_PROCESSES']),
                process_id=int(os.environ['JAX_PROCESS_ID']))
        else:
            jax.distributed.initialize()

    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = REPO / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / 'ckpt'
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / ('log_train_%s.txt'
                             % datetime.datetime.now().strftime('%Y%m%d-%H%M%S'))
    logger = common_utils.create_logger(log_file)
    logger.info('**********************Start logging**********************')
    log_config_to_file(cfg, logger=logger)

    # ---- data
    train_set = build_dataset(
        cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES, training=True,
        logger=logger)
    if cfg.MODEL.get('BACKBONE_3D') is not None and args.rulebooks == 'host':
        train_set.set_rulebook_spec(cfg.MODEL.BACKBONE_3D.NAME,
                              caps_override=cfg.MODEL.BACKBONE_3D.get('LEVEL_CAPACITIES'))
    import torch.utils.data as torch_data
    # spawn + persistent workers: the default fork context re-forks workers
    # every epoch from the multithreaded JAX main process, which eventually
    # deadlocks in the child (observed: worker frozen at 0 CPU mid-run,
    # train loop blocked on its queue). Spawned workers never inherit JAX's
    # thread/lock state and persist across epochs.
    loader = torch_data.DataLoader(
        train_set, batch_size=batch_size, num_workers=args.workers,
        shuffle=True, collate_fn=train_set.collate_batch, drop_last=True,
        pin_memory=False, persistent_workers=args.workers > 0,
        multiprocessing_context='spawn' if args.workers > 0 else None)
    steps_per_epoch = len(loader)
    total_steps = steps_per_epoch * epochs

    # ---- model
    meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'train')
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          class_names=cfg.CLASS_NAMES, dataset_meta=meta,
                          compute_dtype=jnp.bfloat16)

    def to_jnp(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object \
                    and v.dtype.kind not in ('U', 'S'):
                out[k] = jnp.asarray(v)
            elif isinstance(v, dict) and all(
                    isinstance(vv, np.ndarray) and vv.dtype != object
                    and vv.dtype.kind not in ('U', 'S')
                    for vv in v.values()):
                out[k] = {kk: jnp.asarray(vv) for kk, vv in v.items()}
        return out

    example = to_jnp(next(iter(loader)))
    rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    init_fn = jax.jit(lambda r, b: model.init(r, b, train=True))
    variables = init_fn(rngs, example)
    logger.info('model initialized: %d params' % sum(
        np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables['params'])))

    tx = build_optimizer(cfg.OPTIMIZATION, total_steps)
    state = create_train_state(model, variables, tx)

    # ---- resume (reference train.py:144-162 auto-resume)
    mgr = ocp.CheckpointManager(
        ckpt_dir.resolve(),
        options=ocp.CheckpointManagerOptions(max_to_keep=args.max_ckpt_save_num))
    start_epoch = 0
    if mgr.latest_step() is not None:
        state = mgr.restore(mgr.latest_step(), args=ocp.args.StandardRestore(state))
        start_epoch = int(mgr.latest_step())
        logger.info(f'auto-resumed from epoch {start_epoch}')

    # ---- train step (DP when multiple devices)
    devices = jax.devices()[:args.num_devices] if args.num_devices else jax.devices()
    if len(devices) > 1:
        mesh = make_mesh(devices)
        step_fn = make_dp_train_step(model, mesh)
        prep = lambda b: shard_batch(mesh, b)
    else:
        step_fn = jax.jit(make_train_step(model))
        prep = lambda b: b

    def prefetch(iterable, depth=2):
        """Double-buffered host->HBM prefetch (north-star requirement: the
        sparse backbone never stalls on input transfers). Device puts for
        the next `depth` batches are issued while the current step runs."""
        import collections
        buf = collections.deque()
        it_ = iter(iterable)
        for _ in range(depth):
            try:
                buf.append(prep(to_jnp(next(it_))))
            except StopIteration:
                break
        while buf:
            out = buf.popleft()
            try:
                buf.append(prep(to_jnp(next(it_))))
            except StopIteration:
                pass
            yield out

    logger.info(f'start training: {epochs} epochs x {steps_per_epoch} steps, '
                f'{len(devices)} device(s)')
    # TensorBoard scalars on rank 0 (reference train.py:111, train_utils.py:56-64)
    tb_log = None
    if jax.process_index() == 0:
        try:
            from tensorboardX import SummaryWriter
            tb_log = SummaryWriter(log_dir=str(output_dir / 'tensorboard'))
        except ImportError:
            logger.info('tensorboardX not available; skipping TB logging')
    profile_range = tuple(int(x) for x in args.profile_steps.split(',')) \
        if args.profile_steps else None
    metrics_file = open(output_dir / 'metrics.jsonl', 'a')
    log_interval = int(os.environ.get('FV2P_LOG_INTERVAL', '50'))
    it = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, epochs):
        for batch in prefetch(loader):
            if profile_range and it == profile_range[0]:
                jax.profiler.start_trace(str(output_dir / 'profile'))
            state, metrics = step_fn(state, batch)
            it += 1
            if profile_range and it == profile_range[1]:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                logger.info('profiler trace written to %s'
                            % (output_dir / 'profile'))
            if it % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(epoch=epoch, it=it)
                logger.info('epoch %d it %d loss %.4f grad_norm %.2f'
                            % (epoch, it, m['loss'], m['grad_norm']))
                metrics_file.write(json.dumps(m) + '\n')
                metrics_file.flush()
                if tb_log is not None:
                    tb_log.add_scalar('train/loss', m['loss'], it)
                    for k, v in m.items():
                        if k not in ('loss', 'epoch', 'it'):
                            tb_log.add_scalar('train/' + k, v, it)
        if (epoch + 1) % args.ckpt_save_interval == 0 or epoch + 1 == epochs:
            mgr.save(epoch + 1, args=ocp.args.StandardSave(state))
            logger.info(f'saved checkpoint epoch {epoch + 1}')
        from fv2p_tpu.ops.sparse import host_rulebook
        of = host_rulebook.get_overflow_stats()
        if of['samples_over']:
            logger.warning('rulebook capacity overflow (silent truncation!): '
                           '%s — raise MAX_NUMBER_OF_VOXELS or level caps'
                           % of)
        host_rulebook.reset_overflow_stats()
        # host-RSS watchdog: the remote-TPU PJRT client leaks every staged
        # host->device transfer buffer (README Known issues); long runs OOM.
        # At an epoch boundary the training state is fully captured by the
        # newest checkpoint, so save + re-exec is a clean restart point and
        # the persistent compile cache makes it cheap (~30 s).
        rss_gb = (int(open('/proc/self/statm').read().split()[1])
                  * os.sysconf('SC_PAGESIZE') / 1e9)
        if args.max_rss_gb and rss_gb > args.max_rss_gb \
                and epoch + 1 < epochs:
            if (epoch + 1) % args.ckpt_save_interval != 0:
                mgr.save(epoch + 1, args=ocp.args.StandardSave(state))
            mgr.wait_until_finished()
            metrics_file.flush()
            logger.warning(
                'RSS %.1f GB > --max_rss_gb %.1f at epoch %d: re-exec to '
                'reclaim leaked transfer buffers (auto-resume continues)'
                % (rss_gb, args.max_rss_gb, epoch + 1))
            # shut down the persistent DataLoader workers BEFORE execv: the
            # new process image knows nothing about them, so each re-exec
            # otherwise leaks a 4-worker generation (~2 GB RSS) — and with
            # several leaked generations attached to the remote-TPU tunnel
            # the next generation's first batch deadlocks (observed at the
            # third generation of an fv2p_overfit_fullres run).
            try:
                if getattr(loader, '_iterator', None) is not None:
                    loader._iterator._shutdown_workers()
                    loader._iterator = None
            except Exception as e:  # never let cleanup block the restart
                logger.warning('loader shutdown before re-exec failed: %s' % e)
            import multiprocessing
            for child in multiprocessing.active_children():
                child.terminate()
            os.execv(sys.executable, [sys.executable] + sys.argv)
    mgr.wait_until_finished()
    logger.info('**********************End training**********************')

    if args.eval_after_train and jax.process_index() == 0:
        # evaluate the newest checkpoints (reference train.py:200-216)
        sys.path.insert(0, str(REPO / 'tools'))
        from eval_utils import eval_utils

        eval_dir = output_dir / 'eval' / 'eval_with_train'
        eval_dir.mkdir(parents=True, exist_ok=True)
        test_set = build_dataset(cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
                                 training=False, logger=logger)
        if cfg.MODEL.get('BACKBONE_3D') is not None and args.rulebooks == 'host':
            test_set.set_rulebook_spec(cfg.MODEL.BACKBONE_3D.NAME,
                              caps_override=cfg.MODEL.BACKBONE_3D.get('LEVEL_CAPACITIES'))
        test_loader = torch_data.DataLoader(
            test_set, batch_size=batch_size, num_workers=args.workers,
            shuffle=False, collate_fn=test_set.collate_batch, drop_last=False,
            persistent_workers=args.workers > 0,
            multiprocessing_context='spawn' if args.workers > 0 else None)
        eval_meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'test')
        eval_model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                                   class_names=cfg.CLASS_NAMES,
                                   dataset_meta=eval_meta,
                                   compute_dtype=jnp.bfloat16)
        steps = sorted(mgr.all_steps())[-args.num_epochs_to_eval:]
        for step in steps:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(state))
            variables = {'params': restored.params,
                         'batch_stats': restored.batch_stats or {}}
            cur_dir = eval_dir / ('epoch_%d' % step)
            cur_dir.mkdir(parents=True, exist_ok=True)
            logger.info(f'--- eval_with_train: epoch {step} ---')
            eval_utils.eval_one_epoch(
                cfg, eval_model, variables, test_loader, test_set, cur_dir,
                logger, batch_size, epoch_id=step)


if __name__ == '__main__':
    main()
