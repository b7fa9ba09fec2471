"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL (alexpereiramaranhao/etl-lorettoscarpa-1asfb2jf21).

Spark-first re-expression, not a port: the logical plan is declared with the
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy. See
SURVEY.md for the operator inventory this package implements.

Layout:
    session     - SparkSession factory (scale-tuned config)
    schemas     - explicit StructTypes for bronze/gold tables
    sources     - CSV (Brazilian locale) / parquet / table readers
    functions   - native-expression scalar function library (no slow UDFs)
    operators   - upsert (anti-join), surrogate keys, validation, dedup,
                  similarity search
    plans       - end-to-end pipelines (star-schema build, flagship rollups)
    streaming   - Structured Streaming ingest + windowed aggregation
    multimodal  - binary-column (image/audio) plumbing, decode stubbed
"""

__version__ = "0.1.0"
