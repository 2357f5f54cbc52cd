"""torch -> flax weight transplant for golden-parity testing (and for porting
any trained reference checkpoint).

Maps the PyTorch reference's module structures onto our flax param trees:

  * BaseBEVBackbone (reference base_bev_backbone.py:28-81)
      blocks[i]  = Sequential(ZeroPad2d, Conv2d, BN, ReLU, [Conv2d, BN, ReLU]*L)
      deblocks[i] = Sequential(ConvTranspose2d|Conv2d, BN, ReLU)
    -> block{i}/{Conv_k, BatchNorm_k}, deblock{i}/{ConvTranspose_0|Conv_0,
       BatchNorm_0}
  * CenterAFHeadSingle (reference center_af_head_single.py:20-60)
      shared_conv_layer = Sequential(Conv2d, BN, ReLU)*
      per-head Sequential(Conv2d3x3, BN, ReLU, Conv2d-final)
    -> shared_conv{i}/shared_bn{i}; segm/{Conv_0, BatchNorm_0, Conv_1};
       heads_fused_conv/heads_fused_bn (our single wide mid-conv = the
       reference's per-head mid convs concatenated along Cout — identical
       math, better MXU shape); {name}_out.

Layout conversions (verified empirically in tests/test_ref_parity_model.py):
  Conv2d (O, I, kH, kW)          -> flax Conv kernel (kH, kW, I, O)
  ConvTranspose2d (I, O, kH, kW) -> spatial flip + (kH, kW, I, O)
  BatchNorm2d weight/bias/running_mean/running_var
                                 -> params {scale, bias} + batch_stats
                                    {mean, var}
"""
import numpy as np


def conv_kernel(torch_conv):
    return np.ascontiguousarray(
        torch_conv.weight.detach().numpy().transpose(2, 3, 1, 0))


def conv_transpose_kernel(torch_convt):
    w = torch_convt.weight.detach().numpy()
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def bn_params(torch_bn):
    params = {'scale': torch_bn.weight.detach().numpy(),
              'bias': torch_bn.bias.detach().numpy()}
    stats = {'mean': torch_bn.running_mean.detach().numpy(),
             'var': torch_bn.running_var.detach().numpy()}
    return params, stats


def port_bev_backbone(ref_backbone):
    """reference BaseBEVBackbone module -> (params, batch_stats) subtrees
    matching our BaseBEVBackbone/DCNBEVBackbone flax names."""
    params, stats = {}, {}
    for i, block in enumerate(ref_backbone.blocks):
        bp, bs = {}, {}
        conv_idx = 0
        j = 0
        mods = list(block)
        while j < len(mods):
            mod = mods[j]
            cls = type(mod).__name__
            if cls == 'Conv2d':
                bp[f'Conv_{conv_idx}'] = {'kernel': conv_kernel(mod)}
                bn = mods[j + 1]
                p, s = bn_params(bn)
                bp[f'BatchNorm_{conv_idx}'] = p
                bs[f'BatchNorm_{conv_idx}'] = s
                conv_idx += 1
                j += 2
            else:
                j += 1
        params[f'block{i}'] = bp
        stats[f'block{i}'] = bs

    for i, deblock in enumerate(ref_backbone.deblocks):
        mods = list(deblock)
        dp, ds = {}, {}
        head = mods[0]
        if type(head).__name__ == 'ConvTranspose2d':
            dp['ConvTranspose_0'] = {'kernel': conv_transpose_kernel(head)}
        else:
            dp['Conv_0'] = {'kernel': conv_kernel(head)}
        p, s = bn_params(mods[1])
        dp['BatchNorm_0'] = p
        ds['BatchNorm_0'] = s
        if i < len(ref_backbone.blocks):
            params[f'deblock{i}'] = dp
            stats[f'deblock{i}'] = ds
        else:
            # trailing extra deblock (upsample_strides longer than blocks):
            # ours names it at the top level (ConvTranspose_0/BatchNorm_0)
            params['ConvTranspose_0'] = dp['ConvTranspose_0']
            params['BatchNorm_0'] = dp['BatchNorm_0']
            stats['BatchNorm_0'] = ds['BatchNorm_0']
    return params, stats


def port_center_af_head(ref_head, heads_config, num_class):
    """reference CenterAFHeadSingle -> (params, batch_stats) for our
    CenterAFHeadSingle. heads_config: the cfg list (dicts with 'name')."""
    params, stats = {}, {}

    # shared convs: Sequential of [Conv2d, BN, ReLU] * n (+ optional Dropout)
    conv_idx = 0
    mods = list(ref_head.shared_conv_layer)
    j = 0
    while j < len(mods):
        if type(mods[j]).__name__ == 'Conv2d':
            params[f'shared_conv{conv_idx}'] = {'kernel': conv_kernel(mods[j])}
            p, s = bn_params(mods[j + 1])
            params[f'shared_bn{conv_idx}'] = p
            stats[f'shared_bn{conv_idx}'] = s
            conv_idx += 1
            j += 2
        else:
            j += 1

    head_names = [h['name'] for h in heads_config]

    def head_parts(name):
        seq = list(getattr(ref_head, name))
        convs = [m for m in seq if type(m).__name__ == 'Conv2d']
        bns = [m for m in seq if 'BatchNorm' in type(m).__name__]
        return convs[0], (bns[0] if bns else None), convs[-1]

    # segm head keeps its own module
    c0, bn0, c1 = head_parts('segm')
    p, s = bn_params(bn0)
    params['segm'] = {
        'Conv_0': {'kernel': conv_kernel(c0)},
        'BatchNorm_0': p,
        'Conv_1': {'kernel': conv_kernel(c1),
                   'bias': c1.bias.detach().numpy()},
    }
    stats['segm'] = {'BatchNorm_0': s}

    # all other heads: mid convs concatenated into the fused conv/bn
    kernels, scales, biases, means, variances = [], [], [], [], []
    for name in head_names:
        if name == 'segm':
            continue
        c0, bn0, c1 = head_parts(name)
        kernels.append(conv_kernel(c0))
        p, s = bn_params(bn0)
        scales.append(p['scale'])
        biases.append(p['bias'])
        means.append(s['mean'])
        variances.append(s['var'])
        params[f'{name}_out'] = {'kernel': conv_kernel(c1),
                                 'bias': c1.bias.detach().numpy()}
    params['heads_fused_conv'] = {
        'kernel': np.concatenate(kernels, axis=-1)}
    params['heads_fused_bn'] = {
        'scale': np.concatenate(scales), 'bias': np.concatenate(biases)}
    stats['heads_fused_bn'] = {
        'mean': np.concatenate(means), 'var': np.concatenate(variances)}
    return params, stats


def as_jnp_tree(tree):
    import jax.numpy as jnp
    import jax
    return jax.tree_util.tree_map(jnp.asarray, tree)
