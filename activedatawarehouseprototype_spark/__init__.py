"""PySpark-native analytics engine with the query/data-processing
capabilities of the ``Omnd4cc/ActiveDataWarehousePrototype`` reference
(a Flink "active data warehouse": dynamic JSON rule-queries over event
streams, windowed aggregation, ECA rule-spawning), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the live pipeline, plus large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) the reference lacks.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, UTC, Arrow)
- ``catalog``    : loaders for the test star schema + events/documents/embeddings
- ``rules``      : the Rule (query-as-data) model + compiler → DataFrame plans
- ``operators``  : window modes W0-W3, dedup, similarity, text, multimodal
- ``sources``    : batch/streaming event sources incl. the reference's CSV telemetry format
- ``functions``  : scalar function library (geo grid, json, ids)
- ``streaming``  : Structured Streaming pipeline + the ECA active loop
- ``plans``      : plan inspection/verification helpers (pushdown, broadcast, codegen)
"""

__version__ = "0.1.0"
