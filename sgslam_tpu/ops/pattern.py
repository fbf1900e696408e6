"""Deterministic rBRIEF sampling pattern.

The reference embeds OpenCV's learned 256-pair `bit_pattern_31_` table
(/root/reference/src/sg-slam/src/ORBextractor.cc:151-410). We deliberately do
NOT reproduce that table: this framework generates its own fixed pattern —
256 point pairs drawn from an isotropic Gaussian (sigma = patch/5, the BRIEF
"G II" scheme, Calonder et al. 2010) clipped to +/-13, from a fixed seed. The
ORB paper shows random Gaussian pairs are within ~1-2% of the learned pattern
on matching performance; what matters downstream is only internal consistency
of the 256-bit descriptor space.
"""

from __future__ import annotations

import numpy as np

PATCH_HALF = 15          # orientation patch radius (IC_Angle)
PATTERN_RADIUS = 13      # max |coordinate| of a pattern point
DESC_BITS = 256
DESC_WORDS = 8           # uint32 words per descriptor
# A rotated pattern point has radius <= 13*sqrt(2) ~ 18.4 -> patches of
# radius 19 cover every rotation (this is why the reference uses
# EDGE_THRESHOLD=19).
ROT_PATCH_HALF = 19


def make_pattern(seed: int = 42):
    """Returns int32 [256, 4] rows (x1, y1, x2, y2)."""
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_HALF + 1) / 5.0
    pts = rng.normal(scale=sigma, size=(DESC_BITS, 4))
    pts = np.clip(np.round(pts), -PATTERN_RADIUS, PATTERN_RADIUS)
    return pts.astype(np.int32)


PATTERN = make_pattern()
