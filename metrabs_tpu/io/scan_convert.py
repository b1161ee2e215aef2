"""Convert flat EfficientNetV2 variable trees to the nn.scan-stacked layout.

Weight import (`io/weights_import.py`) fills the flat `blocks_{i}` layout;
inference/training wants the scanned layout (`blocks_{i}_scan{n}` groups with
leading stacked axes) for fast XLA compiles. This converter stacks the flat
per-block subtrees into the scanned groups, so imported reference weights run
with scan_blocks=True.
"""

from __future__ import annotations

import re
from typing import Dict

import jax
import numpy as np


def flat_to_scanned(flat_variables: Dict, scanned_template: Dict) -> Dict:
    """Restructures a flat-layout variable tree into the scanned layout.

    `scanned_template` is a variable tree of the scan_blocks=True model (e.g.
    from jitted init) providing the target structure; its values are replaced
    by (stacked) values from `flat_variables`. Non-block entries are copied
    through by name. Works on full variable dicts (params + batch_stats +
    anything else keyed the same way).
    """
    import flax

    flat_src = flax.traverse_util.flatten_dict(flat_variables)
    flat_dst = dict(flax.traverse_util.flatten_dict(scanned_template))

    def src_value(collection: str, block_idx: int, rest):
        key = (collection, f'blocks_{block_idx}') + rest
        if key not in flat_src:
            raise KeyError(f'Missing {key} in flat variables')
        return np.asarray(flat_src[key])

    for key in list(flat_dst):
        collection, module = key[0], key[1]
        m = re.match(r'blocks_(\d+)_scan(\d+)$', module)
        if m:
            start, n = int(m.group(1)), int(m.group(2))
            # Scanned group subtree: key[2] == 'block', rest is the param path.
            rest = key[2:]
            assert rest[0] == 'block', key
            stacked = np.stack([
                src_value(collection, start + i, rest[1:]) for i in range(n)])
            if stacked.shape != flat_dst[key].shape:
                raise ValueError(
                    f'Stacked shape {stacked.shape} != template '
                    f'{flat_dst[key].shape} at {key}')
            flat_dst[key] = stacked.astype(np.asarray(flat_dst[key]).dtype)
        else:
            src_key = key
            if src_key in flat_src:
                value = np.asarray(flat_src[src_key])
                if value.shape != flat_dst[key].shape:
                    raise ValueError(
                        f'Shape mismatch at {key}: {value.shape} vs '
                        f'{flat_dst[key].shape}')
                flat_dst[key] = value.astype(np.asarray(flat_dst[key]).dtype)
            # else: keep template value (e.g. head params absent from a
            # backbone-only import).
    return flax.traverse_util.unflatten_dict(flat_dst)
