"""acero_delta_lake_streaming_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference news-analytics pipeline (``polsm91/acero-delta-lake-streaming``),
re-expressed Spark-first:

* the reference's Acero ``table_source -> project`` plans, pandas dashboard
  queries, and delta-rs medallion writes become one declarative
  DataFrame/SQL surface optimized by Catalyst;
* its JSON-ledger dedup state becomes Structured Streaming
  ``dropDuplicates`` state / idempotent batch MERGE;
* its per-row blocking LLM extraction becomes an Arrow-batched
  ``mapInPandas`` operator with a pluggable provider;
* plus the 100-TB-scale extension operators (dedup, similarity search,
  text analysis, multimodal columns, sessionization).

Nothing here is a port of the reference's implementation — only of its
semantics (see SURVEY.md for the file:line mapping).
"""

from acero_delta_lake_streaming_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
