"""Water-detection kernel: decoded reflectance -> {1,0,-1} mask.

The reference drives the external `waterdetect` clustering package with
NDWI/MNDWI band combinations (src/utils/wd_batch.py:592-638 and
src/utils/WaterDetect.ini:62-145, water-cluster selection `maxndwi`).
This engine replaces the clustering dependency with deterministic
spectral-index thresholding — the documented engine water rule:

- rescale reflectance /10000 (reference: src/utils/wd_batch.py:651-654)
- NDWI  = (Green - NIR)   / (Green + NIR)
- MNDWI = (Green - SWIR2) / (Green + SWIR2)   (when >= 5 bands)
- water = index > threshold (default 0.0, McFeeters rule); MNDWI wins
  when available, else NDWI
- invalid pixels (NIR == 0 for 4-band, SWIR2 == 0 for 5-band;
  reference: src/utils/wd_batch.py:610-618) -> -1 (nodata), matching
  the reference's write_nodata(-1).

Band order contract (reference: src/utils/wd_batch.py:316-327):
[Blue, Green, Red, Nir (, Mir2)].
"""

from __future__ import annotations

import numpy as np

NDWI_THRESHOLD = 0.0


def water_mask(arr: np.ndarray, threshold: float = NDWI_THRESHOLD) -> np.ndarray:
    """(nbands, h, w) uint16 reflectance -> int8 mask {1,0,-1}."""
    nbands = arr.shape[0]
    ref = arr.astype(np.float64) / 10000.0
    green = ref[1]
    nir = ref[3]
    if nbands >= 5:
        swir2 = ref[4]
        invalid = arr[4] == 0
        num, den = green - swir2, green + swir2
    else:
        invalid = arr[3] == 0
        num, den = green - nir, green + nir
    with np.errstate(divide="ignore", invalid="ignore"):
        index = np.where(den != 0.0, num / den, 0.0)
    out = (index > threshold).astype(np.int8)
    out[invalid] = -1
    return out
