"""irivermetrics_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the computations in
tayerthiaggo/irivermetrics (raster/vector surface-water analytics) as an
idiomatic Spark pipeline:

- input: a table of encoded satellite images + captions
  ``(image_id, bytes, w, h, fmt, caption, phash)``;
- decode / water-mask / tile kernels run as batched Arrow
  ``mapInPandas`` / ``applyInPandas`` (never per-row Python);
- the polygon x raster zonal join is a broadcast cell-index equi-join
  (H3-style hex cells) with exact ray-casting point-in-polygon
  refinement on boundary cells;
- all relational stages (validity filters, temporal fill, persistence,
  per-reach metric folds) are plain DataFrame ops that Catalyst
  optimizes (pushdown, partial aggregation, broadcast joins, AQE).

Everything geospatial/morphological (hex index, PIP, CCL,
skeletonization, EDT, Crofton perimeter, BFS diameter) is implemented
from scratch in vectorized numpy — the sandbox has no GDAL / shapely /
scipy / skimage / h3, and the point of the engine is Spark-first
design, not a port.
"""

__version__ = "0.2.0"

# Reference-shaped entry points (waterdetect_batch / calculate_metrics)
# live in irivermetrics_spark.api: ``from irivermetrics_spark import api``.
