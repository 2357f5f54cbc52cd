"""Optimizer + LR schedule factory (TPU-native re-design of reference
``tools/train_utils/optimization/``: the fastai OptimWrapper + OneCycle
(``learning_schedules_fastai.py:60-78``) become optax transforms with
injected hyperparameter schedules)."""
import jax.numpy as jnp
import numpy as np
import optax


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_lr_schedule(lr_max, div_factor, pct_start, total_steps):
    """lr: low -> lr_max over [0, pct_start], lr_max -> low/1e4 over the rest
    (cosine in both phases). Matches reference OneCycle exactly."""
    low = lr_max / div_factor
    a1 = int(total_steps * pct_start)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = step / jnp.maximum(a1, 1)
        p2 = (step - a1) / jnp.maximum(total_steps - a1, 1)
        lr1 = annealing_cos(low, lr_max, jnp.clip(p1, 0.0, 1.0))
        lr2 = annealing_cos(lr_max, low / 1e4, jnp.clip(p2, 0.0, 1.0))
        return jnp.where(step < a1, lr1, lr2)

    return sched


def one_cycle_mom_schedule(moms, pct_start, total_steps):
    """Adam beta1: moms[0] -> moms[1] then back (reference mom_phases)."""
    a1 = int(total_steps * pct_start)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = step / jnp.maximum(a1, 1)
        p2 = (step - a1) / jnp.maximum(total_steps - a1, 1)
        m1 = annealing_cos(moms[0], moms[1], jnp.clip(p1, 0.0, 1.0))
        m2 = annealing_cos(moms[1], moms[0], jnp.clip(p2, 0.0, 1.0))
        return jnp.where(step < a1, m1, m2)

    return sched


def decay_lr_schedule(lr, decay_step_list, lr_decay, lr_clip,
                      steps_per_epoch, warmup_epoch=1, warmup=False):
    """Plain stepped decay (reference optimization/__init__.py:57-81)."""
    boundaries = [int(e * steps_per_epoch) for e in decay_step_list]

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        decay = jnp.ones(())
        for b in boundaries:
            decay = jnp.where(step >= b, decay * lr_decay, decay)
        cur = jnp.maximum(lr * decay, lr_clip)
        if warmup:
            w_steps = warmup_epoch * steps_per_epoch
            warm_lr = lr * (step / jnp.maximum(w_steps, 1))
            cur = jnp.where(step < w_steps, jnp.maximum(warm_lr, lr_clip), cur)
        return cur

    return sched


def build_optimizer(optim_cfg, total_steps):
    """Returns an optax GradientTransformation.

    adam_onecycle (the flagship default, reference
    optimization/__init__.py:20-33): Adam(betas=(mom(t), 0.99)) with decoupled
    ("true") weight decay and the OneCycle lr/mom schedules; global grad-norm
    clipping at GRAD_NORM_CLIP (train_utils.py:40).
    """
    name = optim_cfg.OPTIMIZER
    wd = float(optim_cfg.WEIGHT_DECAY)
    clip = float(optim_cfg.get('GRAD_NORM_CLIP', 0) or 0)

    if name == 'adam_onecycle':
        lr_sched = one_cycle_lr_schedule(
            float(optim_cfg.LR), float(optim_cfg.DIV_FACTOR),
            float(optim_cfg.PCT_START), total_steps)
        mom_sched = one_cycle_mom_schedule(
            tuple(optim_cfg.MOMS), float(optim_cfg.PCT_START), total_steps)
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_sched, b1=mom_sched, b2=0.99, weight_decay=wd)
    elif name == 'adam':
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=float(optim_cfg.LR), weight_decay=wd)
    elif name == 'sgd':
        opt = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(float(optim_cfg.LR), momentum=float(optim_cfg.MOMENTUM)))
    else:
        raise NotImplementedError(name)

    if clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt
