"""metrabs-tpu: TPU-native absolute 3D human pose estimation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
isarandi/metrabs: multi-person `detect_poses` / `estimate_poses` as one fused
XLA graph, plus the full training/eval stack. See SURVEY.md for the structural
map of the reference this was built against.
"""

__version__ = '0.1.0'
