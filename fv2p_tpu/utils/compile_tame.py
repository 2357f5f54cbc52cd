"""Compile-time taming: stage-boundary fusion barriers.

Measured r5 (tools/exp_first_exec.py, real v5e via the axon tunnel): when
only the final predictions are live outputs, XLA fuses the whole
DCN-BEV + head + decode pipeline into structures whose backend compile /
first-execution takes 450-1550 s; placing ``lax.optimization_barrier`` at a
handful of stage boundaries cuts the MGAF program to ~60 s cold with
bit-identical results and no measurable steady-state cost (0.222 s vs
0.221 s per batch-4 step). The barriers only pin values that are real
stage outputs (BEV trunk, head predictions, decoder features) — XLA still
fuses freely within each stage.

Off switch: FV2P_COMPILE_BARRIERS=0, read ONCE at import (the jitted
programs are persistently cached; flipping the env after the first compile
would silently do nothing).
"""
import os

import jax

_COMPILE_BARRIERS = os.environ.get('FV2P_COMPILE_BARRIERS', '1') != '0'


def stage_barrier(x):
    """Identity; a fusion boundary when barriers are enabled."""
    if not _COMPILE_BARRIERS:
        return x
    return jax.lax.optimization_barrier(x)
