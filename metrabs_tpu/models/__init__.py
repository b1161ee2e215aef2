"""Crop models: Metrabs (2D+3D heads), Metro (3D-only), Model25D (2.5D).

Unlike the reference's `models/__init__.py` (which accidentally omits Metro,
SURVEY.md §8.15), all three model classes are exported here.
"""

from metrabs_tpu.models.heads import Head25D, Head3D, MetrabsHeads
from metrabs_tpu.models.metrabs import Metrabs, linear_combine_points, set_last_point_weights
from metrabs_tpu.models.metro import Metro, compute_metro_losses
from metrabs_tpu.models.model25d import Model25D, compute_model25d_losses
