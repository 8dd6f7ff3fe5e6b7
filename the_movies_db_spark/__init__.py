"""the_movies_db_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference ETL project ``tsandil/the_movies_db`` (see SURVEY.md):

- ingestion from paginated REST sources (``sources.rest_api``)
- schema-drift detection & evolution (``schema_evolution``)
- null-safe SCD-1 upsert / MERGE (``upsert``)
- append/overwrite Parquet table sinks with catalog ops (``io``)

plus the large-scale training-data-pipeline operators the north star
requires (``operators``): exact & near-duplicate dedup (MinHash-LSH,
SimHash, n-gram Jaccard), embedding similarity search, text analysis
(language-ID, quality scoring, tokenization, fingerprinting), and
multimodal binary-column plumbing; and Structured Streaming analogs
of the batch pipeline (``streaming``).

Everything is expressed with the DataFrame API / Spark SQL so
Catalyst + Tungsten own the physical plan; Python UDFs appear only as
Arrow-batched pandas UDFs and only where built-ins cannot express the
semantics.
"""

from the_movies_db_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
