"""Weight import from the released reference models.

The released metrabs checkpoints exist in two forms: TF SavedModels (not
loadable without TensorFlow) and the PyTorch port's state_dicts
(`metrabs_pytorch/` with torchvision-style EfficientNetV2 backbones). This
module imports the latter — torch (CPU) is available — following the same
name-mapping approach as the reference's own TF->PT converter
(`metrabs_pytorch/convert_model_from_tf.py:89-202`), but PT->flax:
OIHW conv kernels -> HWIO, depthwise OIHW (O=channels, I=1) -> HWIO with
feature groups, BN (weight, bias, running_mean, running_var) ->
(scale, bias, mean, var).

torchvision EfficientV2 layout (see `metrabs_pytorch/backbones/
efficientnet.py:295-330`): `features.0` stem conv+BN; `features.{1..S}` are
stages of MBConv/FusedMBConv whose `block` submodules are Conv2dNormActivation
/ SE / conv; `features.{S+1}` the head conv+BN. Our flax layout is flat
`blocks_{i}` in the same traversal order, so the import is a linear walk.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _conv_kernel(pt_weight: np.ndarray, depthwise: bool = False) -> np.ndarray:
    """OIHW -> HWIO (flax). Depthwise torch convs have shape [C, 1, H, W] and
    flax feature-grouped convs expect [H, W, 1, C]."""
    if depthwise:
        return np.transpose(pt_weight, (2, 3, 1, 0))
    return np.transpose(pt_weight, (2, 3, 1, 0))


def _bn(params_dst: Dict, stats_dst: Dict, pt: Dict, prefix: str):
    params_dst['scale'] = np.asarray(pt[prefix + '.weight'])
    params_dst['bias'] = np.asarray(pt[prefix + '.bias'])
    stats_dst['mean'] = np.asarray(pt[prefix + '.running_mean'])
    stats_dst['var'] = np.asarray(pt[prefix + '.running_var'])


def import_effnetv2_from_torch(
        state_dict: Dict[str, Any], flax_variables: Dict,
        backbone_scope: str = 'backbone') -> Dict:
    """Fills a flax EfficientNetV2 variable tree from a torchvision-style
    state_dict (as used by metrabs_pytorch). Returns updated variables.

    The walk enumerates torch keys stage by stage and assigns to our
    blocks_{i} modules in order; conv/BN sublayer roles are recognized from
    the key structure within each block.
    """
    import flax

    sd = {k: (v.numpy() if hasattr(v, 'numpy') else np.asarray(v))
          for k, v in state_dict.items()}
    flat = dict(flax.traverse_util.flatten_dict(flax_variables, sep='/'))

    def put(path: str, value: np.ndarray):
        key = path
        if key not in flat:
            raise KeyError(f'No flax parameter at {key}')
        if flat[key].shape != value.shape:
            raise ValueError(
                f'Shape mismatch at {key}: flax {flat[key].shape} vs torch '
                f'{value.shape}')
        flat[key] = value.astype(np.asarray(flat[key]).dtype)

    bb = f'params/{backbone_scope}'
    bs = f'batch_stats/{backbone_scope}'

    # Stem: features.0 = Conv2dNormActivation(conv, bn).
    put(f'{bb}/stem_conv/kernel', _conv_kernel(sd['features.0.0.weight']))
    put(f'{bb}/stem_bn/bn/scale', sd['features.0.1.weight'])
    put(f'{bb}/stem_bn/bn/bias', sd['features.0.1.bias'])
    put(f'{bs}/stem_bn/bn/mean', sd['features.0.1.running_mean'])
    put(f'{bs}/stem_bn/bn/var', sd['features.0.1.running_var'])

    # Stages: group keys features.{s}.{b}.block.*
    stage_ids = sorted({
        int(k.split('.')[1]) for k in sd
        if k.startswith('features.') and k.split('.')[1].isdigit()})
    body_stages = stage_ids[1:-1]  # drop stem and head
    head_stage = stage_ids[-1]

    block_idx = 0
    for s in body_stages:
        b = 0
        while f'features.{s}.{b}.block.0.0.weight' in sd:
            pre = f'features.{s}.{b}.block'
            dst = f'blocks_{block_idx}'
            # Identify fused vs mbconv by sublayer shapes:
            # MBConv: block.0 expand 1x1 (or absent when e=1 -> torchvision
            # always has expand for v2 MBConv stages), block.1 depthwise,
            # block.2 SE, block.3 project.
            # FusedMBConv e!=1: block.0 kxk expand, block.1 project 1x1.
            # FusedMBConv e==1: block.0 kxk project only.
            # torchvision EffNetV2 rule: MBConv blocks have an SE at block.2
            # (fc1/fc2); FusedMBConv blocks have no SE.
            is_mbconv = f'{pre}.2.fc1.weight' in sd
            if is_mbconv:
                put(f'{bb}/{dst}/expand_conv/kernel', _conv_kernel(sd[f'{pre}.0.0.weight']))
                _bn_put(put, bb, bs, dst, 'norm0', sd, f'{pre}.0.1')
                put(f'{bb}/{dst}/depthwise_conv/kernel',
                    _conv_kernel(sd[f'{pre}.1.0.weight'], depthwise=True))
                _bn_put(put, bb, bs, dst, 'norm1', sd, f'{pre}.1.1')
                put(f'{bb}/{dst}/se/reduce/kernel', _conv_kernel(sd[f'{pre}.2.fc1.weight']))
                put(f'{bb}/{dst}/se/reduce/bias', sd[f'{pre}.2.fc1.bias'])
                put(f'{bb}/{dst}/se/expand/kernel', _conv_kernel(sd[f'{pre}.2.fc2.weight']))
                put(f'{bb}/{dst}/se/expand/bias', sd[f'{pre}.2.fc2.bias'])
                put(f'{bb}/{dst}/project_conv/kernel', _conv_kernel(sd[f'{pre}.3.0.weight']))
                _bn_put(put, bb, bs, dst, 'norm2', sd, f'{pre}.3.1')
            else:
                has_expand = f'{pre}.1.0.weight' in sd
                if has_expand:
                    put(f'{bb}/{dst}/expand_conv/kernel',
                        _conv_kernel(sd[f'{pre}.0.0.weight']))
                    _bn_put(put, bb, bs, dst, 'norm0', sd, f'{pre}.0.1')
                    put(f'{bb}/{dst}/project_conv/kernel',
                        _conv_kernel(sd[f'{pre}.1.0.weight']))
                    _bn_put(put, bb, bs, dst, 'norm1', sd, f'{pre}.1.1')
                else:
                    put(f'{bb}/{dst}/project_conv/kernel',
                        _conv_kernel(sd[f'{pre}.0.0.weight']))
                    _bn_put(put, bb, bs, dst, 'norm1', sd, f'{pre}.0.1')
            block_idx += 1
            b += 1

    # Head: features.{last} conv+bn.
    put(f'{bb}/head_conv/kernel', _conv_kernel(sd[f'features.{head_stage}.0.weight']))
    put(f'{bb}/head_bn/bn/scale', sd[f'features.{head_stage}.1.weight'])
    put(f'{bb}/head_bn/bn/bias', sd[f'features.{head_stage}.1.bias'])
    put(f'{bs}/head_bn/bn/mean', sd[f'features.{head_stage}.1.running_mean'])
    put(f'{bs}/head_bn/bn/var', sd[f'features.{head_stage}.1.running_var'])

    return flax.traverse_util.unflatten_dict(flat, sep='/')


def _bn_put(put, bb, bs, dst, norm_name, sd, pt_prefix):
    put(f'{bb}/{dst}/{norm_name}/bn/scale', sd[f'{pt_prefix}.weight'])
    put(f'{bb}/{dst}/{norm_name}/bn/bias', sd[f'{pt_prefix}.bias'])
    put(f'{bs}/{dst}/{norm_name}/bn/mean', sd[f'{pt_prefix}.running_mean'])
    put(f'{bs}/{dst}/{norm_name}/bn/var', sd[f'{pt_prefix}.running_var'])


def import_metrabs_head_from_torch(
        state_dict: Dict[str, Any], flax_variables: Dict,
        head_key: str = 'heatmap_heads') -> Dict:
    """Imports the 1x1 head conv (`metrabs_pytorch/models/metrabs.py:67-85`,
    a LazyConv2d named 'conv_final'). PT OIHW -> flax HWIO; channel layout
    [2d | 3d (d j)] is identical in both."""
    import flax
    sd = {k: (v.numpy() if hasattr(v, 'numpy') else np.asarray(v))
          for k, v in state_dict.items()}
    flat = dict(flax.traverse_util.flatten_dict(flax_variables, sep='/'))
    key = next(k for k in sd if k.endswith('conv_final.weight'))
    bias_key = key.replace('.weight', '.bias')
    dst_k = f'params/{head_key}/conv_final/kernel'
    dst_b = f'params/{head_key}/conv_final/bias'
    flat[dst_k] = np.transpose(sd[key], (2, 3, 1, 0)).astype(
        np.asarray(flat[dst_k]).dtype)
    flat[dst_b] = sd[bias_key].astype(np.asarray(flat[dst_b]).dtype)
    return flax.traverse_util.unflatten_dict(flat, sep='/')
