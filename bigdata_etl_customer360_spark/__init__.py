"""bigdata_etl_customer360_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference project ``tuandte27/BigData_ETL_Customer360``
(a two-script PySpark Customer-360 batch ETL: TV-interaction engagement
profiles and search-behavior trend analysis), generalized into a library of
composable, schema-explicit, deterministic DataFrame operators plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB training-data pipeline needs.

Design stance (see SURVEY.md §7):
- Every operator is a pure function ``DataFrame -> DataFrame``.
- Declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategy.
- Explicit schemas for non-self-describing sources (no inference jobs).
- Python only at the edges, always Arrow-batched (mapInPandas/pandas_udf),
  never row-at-a-time in a hot path.
- Deterministic tie-breaks everywhere the reference was order-dependent.
"""

__version__ = "0.1.0"

from bigdata_etl_customer360_spark.session import get_session, tune_session

__all__ = ["get_session", "tune_session", "__version__"]
