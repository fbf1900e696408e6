"""sgslam_tpu — a TPU-native RGB-D semantic SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of silencht/SG-SLAM
(an ORB-SLAM2-derived C++ system; see /root/reference and SURVEY.md): ORB pyramid
feature extraction, Hamming matching, motion-only/local/global bundle adjustment,
Sim3 pose-graph optimization, BoW place recognition, semantic dynamic-feature
rejection, and semantic voxel mapping — all as fixed-shape, jittable, mesh-shardable
array programs.

Design stance (SURVEY.md §7): array-of-structs map state with validity masks in
place of pointer graphs; pure jitted stages in place of mutex threads; masking in
place of erase/cull surgery; capacity + top-k discipline in place of dynamic shapes.
"""

__version__ = "0.1.0"
