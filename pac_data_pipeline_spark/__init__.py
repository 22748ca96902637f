"""pac_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL suite
(saisrinivas194/pac_data_pipeline), extended with the operators a
large-scale (100 TB) LLM training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash), embedding similarity search, text
analysis, multimodal column plumbing, and event-window analytics.

Design principles
-----------------
* DataFrame/SQL only — every operator is a lazy ``DataFrame ->
  DataFrame`` transform so Catalyst gets the whole plan (predicate
  pushdown, column pruning, join selection, AQE).
* No row-at-a-time Python in the hot path. Where the reference loops
  with ``iterrows()`` we use vectorized column expressions; Python
  appears only in Arrow-batched ``pandas_udf``/``mapInPandas`` for
  operators Spark genuinely lacks.
* Shuffle-aware: small dimensions broadcast, aggregations rely on
  partial+final hash agg, dedup/window ops declare explicit keys so
  the one required shuffle is on the right column.
"""

__version__ = "0.1.0"

from pac_data_pipeline_spark.session import get_spark, tune_session  # noqa: F401
