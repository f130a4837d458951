"""sales_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
``Martialgoda/sales-etl-pipeline`` (reference: ``/root/reference/data/etl.py``)
on Spark's DataFrame/Catalyst stack, extended with the operators a
large-scale (100 TB) training-data pipeline needs: dedup (exact / MinHash-LSH
/ SimHash / n-gram Jaccard / embedding-cosine), similarity search, multimodal
column plumbing, and text analysis.

Design principles (see SURVEY.md §4):
- Declarative DataFrame plans; Catalyst does pushdown/pruning/broadcast.
- Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs only
  where expressions genuinely cannot express the semantics (multimodal decode).
- Every unpartitioned window/sort runs on *aggregated* (small) relations only.
"""

__version__ = "0.1.0"
