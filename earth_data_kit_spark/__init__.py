"""earth_data_kit_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query semantics of
earth-data-kit (reference at /root/reference, cited per-module as
file:line) expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, vectorized pandas/Arrow UDFs for the non-relational math
(cell indexing, ray-cast point-in-polygon, affine tile arithmetic),
explicit broadcast/salt join selection, and checkpoint/lineage tables
for resumability.

Layers (SURVEY.md §7.1):
  grid/       pure numpy/python math (no Spark imports)
  text/       pinned extractor + geocoding + text analysis (pure)
  functions/  pandas UDFs and Column-expression builders
  operators/  DataFrame transformations (discover, assign, joins, knn,
              dedup, similarity, multimodal)
  sources/    deterministic synthetic pages table + catalog seam
  plans/      lineage / checkpoint / resume
  streaming/  tumbling-window operators (batch + structured streaming)
"""

__version__ = "0.1.0"
