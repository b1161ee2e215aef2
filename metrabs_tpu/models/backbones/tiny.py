"""Tiny stride-32 backbone for fast integration tests (no reference analogue;
fills the role of the fake-backbone test fixture recommended in SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class TinyBackbone(nn.Module):
    """Five stride-2 convs: [N, S, S, 3] -> [N, S/32, S/32, width].

    `use_bn` adds BatchNorm after each conv — for tests that need real
    batch_stats (e.g. the finetune_in_inference_mode freeze semantics).
    """

    width: int = 32
    dtype: Any = jnp.bfloat16
    use_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i in range(5):
            x = nn.Conv(self.width, (3, 3), strides=(2, 2), padding='SAME',
                        dtype=self.dtype, param_dtype=jnp.float32,
                        use_bias=not self.use_bn, name=f'conv{i}')(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f'bn{i}')(x)
            x = nn.relu(x)
        return x
