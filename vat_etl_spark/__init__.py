"""vat_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference VAT ETL app (Rishavv007/vat-etl,
``/root/reference/fianl2.py``), re-architected Spark-first.

Design principles (SURVEY.md §7):

- Lazy DataFrames everywhere; every pipeline step is a declarative
  transformation Catalyst can optimize (predicate pushdown, column pruning,
  whole-stage codegen).
- Zero Python UDFs on the core path: the reference's scalar UDFs
  (currency parse, date parse, month extract) are re-expressed as native
  column expressions so they run JVM-side at 100 TB scale.
- A ``compat`` flag reproduces the reference's behavioral quirks bit-for-bit
  (SURVEY.md §8); ``sane`` mode applies documented fixes.
- Extensions for large-scale training-data pipelines: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine), similarity
  search, text analysis, multimodal column handling, structured streaming.
"""

__version__ = "0.1.0"
