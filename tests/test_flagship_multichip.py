"""Flagship-config program across a multi-device mesh (VERDICT r3 item 6).

Until r3 only 64-voxel toy configs had ever crossed a mesh; here the REAL
mgaf-3dssd.yaml topology (full DCN BEV backbone + CenterAF head + rotated
NMS post-processing, reduced caps) runs an 8-virtual-device sharded eval
whose merged outputs must match the single-device run of the same batch.

Reference analogue: eval-side DDP wrapping the full model
(``tools/eval_utils/eval_utils.py:44-48``) with per-rank shards merged by
``common_utils.merge_results_dist``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv2p_tpu.parallel import (DATA_AXIS, batch_spec, make_mesh, shard_batch)
from jax.sharding import PartitionSpec as P

from .flagship_mesh import build_flagship_reduced


@pytest.mark.slow
@pytest.mark.parametrize('flagship', ['mgaf', 'fv2p'])
def test_flagship_sharded_eval_matches_single_device(flagship):
    assert len(jax.devices()) >= 8, jax.devices()
    cfg, model, batch_np = build_flagship_reduced(split='test', batch_size=8,
                                                  flagship=flagship)

    batch = {k: (jnp.asarray(v) if not isinstance(v, dict)
                 else {kk: jnp.asarray(vv) for kk, vv in v.items()})
             for k, v in batch_np.items()}
    init_fn = jax.jit(lambda r, b: model.init(r, b, train=False))
    variables = init_fn(jax.random.PRNGKey(0),
                        jax.tree_util.tree_map(lambda x: x[:1], dict(batch)))

    @jax.jit
    def infer_single(variables, b):
        out = model.apply(variables, dict(b), train=False)
        return {k: out[k] for k in
                ('pred_boxes', 'pred_scores', 'pred_labels', 'pred_valid')}

    single = jax.device_get(infer_single(variables, batch))

    mesh = make_mesh(jax.devices()[:8])
    keys = tuple(single)

    def per_device(variables, b):
        out = model.apply(variables, dict(b), train=False)
        return {k: out[k] for k in keys}

    @jax.jit
    def step(variables, b):
        return jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(), variables),
                      batch_spec(b)),
            out_specs=P(DATA_AXIS), check_vma=False)(variables, b)

    out = step(variables, shard_batch(mesh, batch))
    sharded = jax.device_get(out)

    for k in single:
        a, b = np.asarray(single[k]), np.asarray(sharded[k])
        if k in ('pred_labels', 'pred_valid'):
            np.testing.assert_array_equal(
                a, b, err_msg=f'{k}: sharded flagship eval != single-device')
        else:
            # XLA tiles the (B*K, C) GEMMs differently at per-device batch 1
            # vs global batch 8, so f32 reduction order (hence the last ulp)
            # legitimately differs; observed maxabs ~3e-8 on boxes. Semantics
            # (labels/valid above) must still match exactly.
            np.testing.assert_allclose(
                a, b, atol=1e-4, rtol=1e-4,
                err_msg=f'{k}: sharded flagship eval != single-device')

    # sanity: the program actually produced live detections structure
    assert single['pred_boxes'].shape[0] == 8
    assert single['pred_boxes'].shape[-1] == 7
