"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL pipeline (jacobwarren/
social-media-ai-engineering-etl), re-expressed Spark-first.

Layout:
    session     -- tuned SparkSession factory
    schemas     -- declared StructType schemas (post, pairs, events, ...)
    functions/  -- column-expression libraries (native, JVM-side)
    operators/  -- composite DataFrame->DataFrame operators
    sources/    -- readers, sinks, contracts, lineage manifest
    plans/      -- pipeline stages as pure DataFrame transformations
    streaming/  -- Structured Streaming ingestion
"""

__version__ = "0.1.0"
