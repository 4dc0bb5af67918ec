"""oxford_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of the reference pipeline ``Bert-Shengyuan/Oxford_data_pipeline``
(event-aligned segmentation, QC filtering, PSTH, cross-validated PCA/CCA,
GLM with inference, sensitivity/stability grids, sign alignment,
cross-session statistics), plus large-scale training-data operators
(dedup, similarity search, text analysis, multimodal columns).

Design decisions (SURVEY.md §1/§7):
- Everything is a long/tidy DataFrame; dense matrices exist only
  transiently inside grouped ``applyInPandas`` UDFs.
- Declarative plans (DataFrame/SQL) so Catalyst does pushdown/pruning/
  broadcast; no hand-scheduling, no RDDs.
- Interval joins are rewritten as explode+equi-join so they shuffle
  on equality keys and scale linearly.
- Every seeded/random or order-dependent semantic carries an explicit
  ordering or seed column, so results are deterministic under parallelism.
"""

from oxford_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
