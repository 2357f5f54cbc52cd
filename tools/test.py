"""Evaluation entry point (reference ``tools/test.py``): single-checkpoint
eval or an ``--eval_all`` watcher loop that polls the checkpoint directory
and keeps an eval-record file of already-evaluated epochs."""
import argparse
import datetime
import glob
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_config():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, default=None)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--dtype', choices=['bfloat16', 'float32'],
                        default='bfloat16',
                        help='model compute dtype. bfloat16 (default) is '
                             'the dtype of record — AP-identical to f32 on '
                             'the committed learning-gate artifact; the f32 '
                             'MGAF eval program faults the TPU runtime in '
                             'this environment (see README Known issues), '
                             'so use float32 only with FV2P_PLATFORM=cpu')
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    parser.add_argument('--save_to_file', action='store_true', default=False)
    parser.add_argument('--eval_all', action='store_true', default=False,
                        help='evaluate all checkpoints in ckpt_dir as they appear')
    parser.add_argument('--ckpt_dir', type=str, default=None,
                        help='checkpoint dir for --eval_all')
    parser.add_argument('--max_waiting_mins', type=int, default=30,
                        help='--eval_all: give up after this many idle minutes')
    parser.add_argument('--start_epoch', type=int, default=0)
    parser.add_argument('--num_devices', type=int, default=None,
                        help='data-parallel eval over this many local '
                             'devices (batch shards over a 1-D mesh, '
                             'params replicated; default 1)')
    parser.add_argument('--dist', action='store_true', default=False,
                        help='multi-process eval: jax.distributed, each '
                             'process scores its dataset shard, results '
                             'merged on rank 0 (reference dist_test.sh)')
    parser.add_argument('--rulebooks', choices=['host', 'device'],
                        default=os.environ.get('FV2P_RULEBOOKS', 'host'),
                        help='host: ship precomputed sparse-conv tables; '
                             'device: build them in-graph from coords '
                             '(~100x less host->HBM traffic)')
    args = parser.parse_args()

    from fv2p_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def _restore_variables(model, example_variables, ckpt_path, logger):
    import numpy as np
    import orbax.checkpoint as ocp
    path = Path(ckpt_path).resolve()
    # CheckpointManager step dirs nest the pytree under the 'default' item
    if (path / 'default' / '_METADATA').exists():
        path = path / 'default'
    # restore to host numpy (device-neutral): the checkpoint records the
    # sharding it was saved under (e.g. the TPU), which would fail to
    # restore on a different platform; jit moves the arrays on first use
    import jax
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    restored = ckptr.restore(path,
                             args=ocp.args.PyTreeRestore(restore_args=restore_args))
    logger.info(f'restored from {ckpt_path}')
    return {'params': restored['params'],
            'batch_stats': restored.get('batch_stats', {})}


def _is_committed_step_dir(path):
    """A finalized orbax CheckpointManager step dir: fully-numeric name and
    the written pytree's _METADATA present (in-progress temp dirs like
    '5.orbax-checkpoint-tmp-<ts>' have suffixed names and no metadata yet)."""
    p = Path(path)
    if not p.name.isdigit():
        return False
    return ((p / 'default' / '_METADATA').exists()
            or (p / '_METADATA').exists())


def get_no_evaluated_ckpt(ckpt_dir, record_file, start_epoch):
    """Oldest not-yet-evaluated *committed* checkpoint (reference
    test.py:67-83). Orbax checkpoints are directories named by integer step
    under ckpt_dir; sort numerically (lexicographic puts 10 before 2) and
    skip orbax in-progress temp dirs so we never restore a half-written
    checkpoint while training is still saving."""
    ckpt_list = [p for p in glob.glob(str(Path(ckpt_dir) / '*'))
                 if _is_committed_step_dir(p)]
    ckpt_list.sort(key=lambda p: int(Path(p).name))
    evaluated = [int(float(x.strip())) for x in open(record_file).readlines()] \
        if Path(record_file).exists() else []
    for cur_ckpt in ckpt_list:
        epoch_id = int(Path(cur_ckpt).name)
        if epoch_id not in evaluated and epoch_id >= start_epoch:
            return epoch_id, cur_ckpt
    return -1, None


def main():
    args, cfg = parse_config()
    from fv2p_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from fv2p_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    if args.dist:
        # one process per host (tools/scripts/dist_test.sh); coordinator
        # discovered from the TPU metadata or JAX_COORDINATOR_ADDRESS env
        import os as _os
        kw = {}
        if 'JAX_COORDINATOR_ADDRESS' in _os.environ:
            kw = dict(
                coordinator_address=_os.environ['JAX_COORDINATOR_ADDRESS'],
                num_processes=int(_os.environ['JAX_NUM_PROCESSES']),
                process_id=int(_os.environ['JAX_PROCESS_ID']))
        jax.distributed.initialize(**kw)

    import jax.numpy as jnp
    import numpy as np

    from eval_utils import eval_utils
    from fv2p_tpu.datasets import build_dataset, dataset_meta_from_cfg
    from fv2p_tpu.models import build_network
    from fv2p_tpu.utils import common_utils

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    output_dir = REPO / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_dir = output_dir / 'eval'
    eval_dir.mkdir(parents=True, exist_ok=True)
    logger = common_utils.create_logger(
        eval_dir / ('log_eval_%s.txt'
                    % datetime.datetime.now().strftime('%Y%m%d-%H%M%S')))

    test_set = build_dataset(
        cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES, training=False,
        logger=logger)
    if cfg.MODEL.get('BACKBONE_3D') is not None and args.rulebooks == 'host':
        test_set.set_rulebook_spec(cfg.MODEL.BACKBONE_3D.NAME,
                              caps_override=cfg.MODEL.BACKBONE_3D.get('LEVEL_CAPACITIES'))
    import torch.utils.data as torch_data
    # multi-process: stride-shard the dataset over ranks (reference
    # DistributedSampler; eval_utils._interleave restores dataset order)
    sampler = None
    if args.dist and jax.process_count() > 1:
        sampler = list(range(jax.process_index(), len(test_set),
                             jax.process_count()))
        logger.info(f'rank {jax.process_index()}/{jax.process_count()}: '
                    f'{len(sampler)} of {len(test_set)} samples')
    # spawn + persistent workers — fork from the multithreaded JAX process
    # deadlocks (see the matching note in train.py)
    loader = torch_data.DataLoader(
        test_set, batch_size=batch_size, num_workers=args.workers,
        shuffle=False, collate_fn=test_set.collate_batch, drop_last=False,
        sampler=sampler,
        persistent_workers=args.workers > 0,
        multiprocessing_context='spawn' if args.workers > 0 else None)

    meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'test')
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          class_names=cfg.CLASS_NAMES, dataset_meta=meta,
                          compute_dtype=getattr(jnp, args.dtype))

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
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, example)

    tb_log = None
    try:
        from tensorboardX import SummaryWriter
        tb_log = SummaryWriter(log_dir=str(eval_dir / 'tensorboard'))
    except ImportError:
        pass

    mesh = None
    n_dev = args.num_devices or 1
    if n_dev > 1:
        from fv2p_tpu.parallel import make_mesh
        local = jax.local_devices()
        assert n_dev <= len(local), (n_dev, local)
        mesh = make_mesh(local[:n_dev])
        logger.info(f'eval mesh: {n_dev} local devices')

    if not args.eval_all:
        if args.ckpt:
            variables = _restore_variables(model, variables, args.ckpt, logger)
        eval_utils.eval_one_epoch(
            cfg, model, variables, loader, test_set, eval_dir, logger,
            batch_size, save_to_file=args.save_to_file, tb_log=tb_log,
            mesh=mesh)
        logger.info('****************End evaluation****************')
        return

    # ---- --eval_all watcher (reference test.py:85-131)
    ckpt_dir = Path(args.ckpt_dir) if args.ckpt_dir else output_dir / 'ckpt'
    record_file = eval_dir / ('eval_list_%s.txt' % cfg.DATA_CONFIG.DATA_SPLIT['test'])
    wait_second = 30
    total_time = 0
    while True:
        epoch_id, cur_ckpt = get_no_evaluated_ckpt(
            ckpt_dir, record_file, args.start_epoch)
        if epoch_id == -1:
            total_time += wait_second
            if total_time > args.max_waiting_mins * 60:
                logger.info('max waiting time reached; exiting')
                break
            print('Wait %s seconds for next check (progress: %.1f / %d minutes): %s'
                  % (wait_second, total_time / 60, args.max_waiting_mins,
                     ckpt_dir), end='\r')
            time.sleep(wait_second)
            continue
        total_time = 0
        variables = _restore_variables(model, variables, cur_ckpt, logger)
        cur_eval_dir = eval_dir / ('epoch_%d' % epoch_id)
        cur_eval_dir.mkdir(parents=True, exist_ok=True)
        eval_utils.eval_one_epoch(
            cfg, model, variables, loader, test_set, cur_eval_dir, logger,
            batch_size, save_to_file=args.save_to_file, tb_log=tb_log,
            epoch_id=epoch_id, mesh=mesh)
        with open(record_file, 'a') as f:
            print('%d' % epoch_id, file=f)
        logger.info('Epoch %d has been evaluated' % epoch_id)
    logger.info('****************End evaluation****************')


if __name__ == '__main__':
    main()
