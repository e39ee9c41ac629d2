"""spark_kinesis_article_analysis_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``ferrim2/spark-kinesis-article-analysis`` (a PySpark 3.5
Structured Streaming pipeline: Kinesis JSON articles -> word count ->
sliding event-time window avg -> Parquet; see
``reference/app/process_articles.py:53-91``), extended with the
relational/OLAP operator core and LLM-training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) that a
100 TB-scale deployment needs.

Layout
------
- ``session``    — SparkSession factory (AQE, shuffle sizing, UTC, Arrow).
- ``catalog``    — table loading for the driver test corpus.
- ``registry``   — named-query registry: every operator ships as a
  ``QuerySpec`` with a DataFrame builder and (where SQL-expressible) a
  DuckDB oracle SQL string. ``__spark_entry__.py`` is a thin view of it.
- ``operators/`` — relational core: filter/join/agg/window/setop/sort.
- ``functions/`` — scalar families + text analysis, dedup, similarity,
  multimodal column plumbing.
- ``streaming/`` — Structured Streaming layer: the article pipeline as a
  shared batch/stream transform, watermarks, windows, sinks, Kinesis
  source config plumbing.
- ``sources/``   — batch/stream readers (parquet/json/csv, file stream).
- ``plans/``     — plan inspection helpers (explain capture, shuffle and
  scan-pushdown assertions used by the perf tests).
"""

__version__ = "0.1.0"
