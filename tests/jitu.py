"""Jit wrappers for the heavy end-to-end model tests.

Eager flax ``init``/``apply``/``value_and_grad`` dispatch op-by-op on CPU —
measured ~70 s for a tiny e2e detector init that traces in ~3 s under jit
(and the persistent compile cache makes warm reruns near-free). These
helpers keep the call sites one-liners.
"""
import jax


def jinit(model, rngs, batch, train=False):
    return jax.jit(lambda r, b: model.init(r, b, train=train))(rngs, batch)


def japply(model, variables, batch, train=False, mutable=None, rngs=None):
    kw = {}
    if mutable is not None:
        kw['mutable'] = mutable
    if rngs is None:
        fn = jax.jit(lambda v, b: model.apply(v, b, train=train, **kw))
        return fn(variables, batch)
    fn = jax.jit(lambda v, b, r: model.apply(v, b, train=train, rngs=r, **kw))
    return fn(variables, batch, rngs)


def jgrad(loss_fn, params):
    """jitted ``jax.value_and_grad(loss_fn, has_aux=True)(params)``."""
    return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
