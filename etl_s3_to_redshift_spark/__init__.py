"""PySpark-native analytics engine with the capabilities of
kbaafi/etl-s3-to-redshift, rebuilt Spark-first.

The reference (read-only at /root/reference) is a Redshift star-schema ETL
whose query semantics live in SQL strings (sql_queries.py). This package
re-expresses those capabilities — JSON ingestion with explicit/auto schema,
epoch-millis timestamp handling, dimensional dedup, multi-key left outer
joins with replicated (broadcast) dimensions, date-part extraction,
full-refresh loads — as declarative DataFrame plans that Catalyst optimizes,
plus the large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns) the north star calls for.

Layout:
    session     SparkSession factory tuned for the target cluster shape
    schemas     explicit StructType schemas (no inference at scale)
    sources/    JSON / parquet readers, sinks (parquet + Redshift JDBC stub)
    functions/  column-level helpers (casts, text, vectors)
    operators/  relational + extension operators (dedup, similarity, text)
    plans/      end-to-end pipelines (the reference-equivalent star build)
    streaming/  Structured Streaming shapes with batch twins
"""

__version__ = "0.1.0"
