"""dsacord_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of MrBoombastic/DSAcord (reference: Go ETL tool,
/root/reference), re-expressed Spark-first.

Layers
------
A. Faithful reimplementation of the reference ingestion dataflow
   (download -> unzip -> parse CSV -> typed transform -> dedup/upsert sink),
   see SURVEY.md §2/§3.
B. Analytics operators a large-scale training-data pipeline needs:
   dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
   similarity search, text analysis, multimodal column plumbing.

Everything is built on the DataFrame API so Catalyst can optimize
(pushdown, pruning, broadcast, AQE); Python UDFs are confined to the
ZIP-extraction source and multimodal decode stubs.
"""

__version__ = "0.1.0"
