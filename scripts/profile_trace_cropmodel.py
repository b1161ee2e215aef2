"""Op-level time attribution of the crop-model forward via jax.profiler.

Runs EffNetV2-L@384 batch-128 under a profiler trace and aggregates device
op durations by category (conv-MXU vs depthwise vs SE/elementwise etc.) from
the trace-viewer JSON — the evidence base for deciding whether a Pallas
depthwise/SE fusion is worth building (PARITY.md MFU profile).

  python scripts/profile_trace_cropmodel.py [--backbone efficientnetv2-l]
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._tracelib import exclusive_op_durations, load_latest_trace


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--backbone', default='efficientnetv2-l')
    parser.add_argument('--res', type=int, default=384)
    parser.add_argument('--batch', type=int, default=128)
    parser.add_argument('--iters', type=int, default=3)
    parser.add_argument('--outdir', default='/tmp/jax_trace_cropmodel')
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs

    res, batch = args.res, args.batch
    cfg = ModelConfig(proc_side=res, depth=8, n_joints=17, dtype='bfloat16',
                      backbone=args.backbone)
    model = Metrabs(cfg=cfg, backbone=build_backbone(args.backbone))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, res, res, 3), jnp.bfloat16), jnp.eye(3)[None])

    @jax.jit
    def fwd(p, image, K):
        return model.apply(p, image, K, train=False)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(size=(batch, res, res, 3)), jnp.bfloat16)
    K = jnp.tile(jnp.asarray(np.array(
        [[400.0, 0, res / 2], [0, 400.0, res / 2], [0, 0, 1]],
        np.float32))[None], (batch, 1, 1))
    np.asarray(fwd(params, image, K))  # compile

    with jax.profiler.trace(args.outdir):
        for _ in range(args.iters):
            np.asarray(fwd(params, image, K))

    # Parse the trace-viewer JSON. Exclusive durations via _tracelib: the
    # scan-stacked backbone lowers to a `while` whose parent span CONTAINS
    # the stage ops on the same thread — raw sums double-count ~2x.
    events = load_latest_trace(args.outdir)
    if events is None:
        print('NO TRACE FILES — device profiling unsupported on this runtime')
        return

    def category(name):
        n = name.lower()
        if 'while' in n:
            return 'while bookkeeping (scan overhead)'
        if 'depthwise' in n or ('conv' in n and 'feature_group' in n):
            return 'depthwise-conv'
        if 'convolution' in n or 'conv' in n or 'dot' in n:
            return 'conv/dot (MXU)'
        if 'reduce' in n or 'mean' in n:
            return 'reduce (SE/softargmax)'
        if 'fusion' in n:
            return 'fusion (elementwise)'
        if 'copy' in n or 'transpose' in n or 'reshape' in n or 'bitcast' in n:
            return 'layout/copy'
        return 'other'

    totals = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for name, dur_us in exclusive_op_durations(events):
        dur = dur_us / 1e3  # us -> ms
        totals[category(name)] += dur
        by_name[name[:80]] += dur
        total += dur
    print(f'total device time: {total:.2f} ms over {args.iters} iters '
          f'({total / args.iters:.2f} ms/iter)')
    for cat, ms in totals.most_common():
        print(f'  {cat:26s} {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%')
    print('\ntop 15 ops:')
    for name, ms in by_name.most_common(15):
        print(f'  {ms:9.2f} ms  {name}')


if __name__ == '__main__':
    main()
