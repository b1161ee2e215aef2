"""Load-time BatchNorm folding for inference.

At inference, BatchNorm is a per-channel affine: y = x * g + b with
g = gamma / sqrt(var + eps), b = beta - mean * g (the reference materializes
exactly these in its fused inference BN, `metrabs_tf/backbones/efficientnet/
effnetv2_utils.py:56-66`). For a conv -> BN pair, that affine folds EXACTLY
into the conv: kernel' = kernel * g (per output channel), bias' = b (+ the
conv's own bias * g, if it had one). The BN op then disappears from the
serving graph — on TPU that removes a full HBM read-modify-write of every
activation tensor (XLA does not epilogue-fuse elementwise ops into
convolutions), measured at ~8% of the EffNetV2-L@384 forward
(PROBE_INFER_r04.json bn_identity).

This module is the variables side of the transform: `fold_bn_variables`
rewrites a msgpack/checkpoint variable tree (multiplying kernels, minting
conv biases, deleting the BN leaves). The structure side is the `bn_fold`
flag on the backbone/detector modules (convs declare `use_bias=True`, BN
modules are skipped), applied by `io.packaging.load_pose_estimator` at
serving load time alongside the scan unroll (`io/scan_convert.py`).

Pairing is by sibling-name convention, covering every conv->BN family in
the repo (EffNetV2, MobileNetV3, ResNet V1/V1.5, YOLOv4 darknet blocks);
ResNet V2's PRE-activation BNs (BN -> relu -> conv) are not foldable — the
relu between the affine and the conv blocks the merge — and are rejected.
Works on flat and nn.scan-stacked layouts (stacked BN leaves [n, C] fold
into stacked kernels [n, ..., C]).
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np

# BN epsilon per module-name convention (each family hard-codes one epsilon
# for all its BNs; see BN_EPSILON in the backbone modules and the darknet
# ConvBlock). Keyed by a predicate on the BN module name.
_EFFNET_BN_NAMES = ('stem_bn', 'head_bn', 'norm0', 'norm1', 'norm2')


def _conv_candidates(bn_name: str) -> Iterator[str]:
    """Sibling module names that could hold the conv feeding `bn_name`.

    Conventions in-repo:
      yolo ConvBlock:   conv_i/{conv, bn}           -> 'bn'        : 'conv'
      mobilenet_v3:     {stem_conv, stem_bn}, {expand, expand_bn},
                        {depthwise, depthwise_bn}, {project, project_bn},
                        {conv_1, conv_1_bn}         -> 'X_bn'      : 'X'
      efficientnet_v2:  {stem_conv, stem_bn}, {head_conv, head_bn},
                        {expand_conv, norm0}, {depthwise_conv, norm1},
                        {project_conv, norm1|norm2} -> per-name map
      resnet V1/V1.5:   {convK, bnK}                -> 'bnK'       : 'convK'
    """
    if bn_name == 'bn':
        yield 'conv'
    if bn_name.endswith('_bn'):
        base = bn_name[:-3]
        yield base
        yield base + '_conv'
    if bn_name.startswith('bn') and bn_name[2:].isdigit():
        yield 'conv' + bn_name[2:]
    if bn_name == 'norm0':
        yield 'expand_conv'
    if bn_name == 'norm1':
        # MBConv: depthwise_conv -> norm1; FusedMBConv: project_conv -> norm1
        # (only one of the two convs exists in a given block scope).
        yield 'depthwise_conv'
        yield 'project_conv'
    if bn_name == 'norm2':
        yield 'project_conv'


def _find_conv_kernel_key(flat_params: Dict[Tuple, np.ndarray],
                          parent: Tuple, bn_name: str):
    """Kernel key of the conv sibling feeding this BN, or None."""
    for cand in _conv_candidates(bn_name):
        for key in (parent + (cand, 'kernel'),
                    # DenseSameConv / darknet ConvBlock wrap nn.Conv in a
                    # child scope named 'conv'.
                    parent + (cand, 'conv', 'kernel')):
            if key in flat_params:
                return key
    return None


def fold_bn_variables(variables: Dict, epsilon: float) -> Dict:
    """Folds every inference-mode BN into its feeding conv; returns a new
    variable tree with BN leaves removed and conv biases minted/updated.

    `epsilon`: the family's BN epsilon (EffNetV2/MobileNetV3 1e-3,
    ResNet 1e-5, darknet 1e-5 — each family uses ONE value throughout).
    Raises ValueError on a BN with no matching conv sibling (e.g. ResNet
    V2 preact BNs) so unsupported architectures fail loudly instead of
    silently serving wrong numerics. All arithmetic is float64 host-side,
    cast back to the stored parameter dtype (float32).
    """
    import flax

    params = dict(flax.traverse_util.flatten_dict(variables['params']))
    stats = dict(flax.traverse_util.flatten_dict(
        variables.get('batch_stats', {})))

    bn_scopes = [key[:-1] for key in params
                 if len(key) >= 3 and key[-2:] == ('bn', 'scale')]
    for scope in bn_scopes:  # scope = (..., bn_name, 'bn')
        # Two declaration shapes in-repo:
        #  (a) GhostBatchNorm wrapper: <parent>/<bn_name>/bn/scale — the
        #      conv is a SIBLING of <bn_name> inside <parent>;
        #  (b) bare nn.BatchNorm named 'bn' (darknet ConvBlock, yolov8):
        #      <block>/bn/scale — the conv is the 'conv' sibling of 'bn'
        #      inside <block>.
        parent, bn_name = scope[:-2], scope[-2]
        kernel_key = _find_conv_kernel_key(params, parent, bn_name)
        if kernel_key is None:
            kernel_key = _find_conv_kernel_key(params, scope[:-1], 'bn')
        if kernel_key is None:
            raise ValueError(
                f'BN at {"/".join(scope)} has no conv sibling to fold into '
                f'(pre-activation BNs cannot be folded); candidates tried: '
                f'{list(_conv_candidates(bn_name))}')
        gamma = np.asarray(params.pop(scope + ('scale',)), np.float64)
        beta = np.asarray(params.pop(scope + ('bias',)), np.float64)
        mean = np.asarray(stats.pop(scope + ('mean',)), np.float64)
        var = np.asarray(stats.pop(scope + ('var',)), np.float64)

        kernel = params[kernel_key]
        dtype = np.asarray(kernel).dtype
        g = gamma / np.sqrt(var + epsilon)
        b = beta - mean * g
        # Broadcast g ([C] flat, [n, C] scanned) over the kernel's output
        # channels (last axis), keeping any leading stack axes aligned.
        g_k = g.reshape(g.shape[:-1] + (1,) * (np.asarray(kernel).ndim
                                               - g.ndim) + (g.shape[-1],))
        params[kernel_key] = (np.asarray(kernel, np.float64) * g_k).astype(dtype)
        bias_key = kernel_key[:-1] + ('bias',)
        if bias_key in params:
            b = b + np.asarray(params[bias_key], np.float64) * g
        params[bias_key] = b.astype(dtype)

    out = dict(variables)
    out['params'] = flax.traverse_util.unflatten_dict(params)
    if 'batch_stats' in variables:
        if stats:
            out['batch_stats'] = flax.traverse_util.unflatten_dict(stats)
        else:
            out.pop('batch_stats', None)
    return out


def backbone_supports_bn_fold(backbone_name: str) -> bool:
    """Families whose serving graphs have a conv->BN structure foldable by
    `fold_bn_variables` + the modules' `bn_fold` flag. ResNet V2 (preact)
    and GroupNorm variants are excluded (GroupNorm statistics are
    data-dependent; preact BNs sit behind a relu)."""
    name = backbone_name.lower().replace('_', '-')
    if name.startswith('efficientnetv2') or name.startswith('mobilenetv3'):
        return True
    if name.startswith('resnet'):
        return 'v2' not in name and 'groupnorm' not in name
    return False


def bn_epsilon_for(backbone_name: str) -> float:
    """The single BN epsilon a family uses throughout (module constants)."""
    name = backbone_name.lower().replace('_', '-')
    if name.startswith('resnet'):
        from metrabs_tpu.models.backbones.resnet import BN_EPSILON
        return BN_EPSILON
    if name.startswith('mobilenetv3'):
        from metrabs_tpu.models.backbones.mobilenet_v3 import BN_EPSILON
        return BN_EPSILON
    from metrabs_tpu.models.backbones.efficientnet_v2 import BN_EPSILON
    return BN_EPSILON
