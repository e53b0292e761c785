"""spark_streaming_apps_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
RANDCorporation/spark-streaming-apps (the DFORC2/DESH forensic streaming
pipeline) on idiomatic PySpark: DataFrame/SQL + Catalyst for the relational
surface, Structured Streaming for the stream surface, Arrow-batched pandas
UDFs only where built-ins cannot express the semantics.

The reference keeps its relational semantics in embedded PostgreSQL SQL and a
PL/pgSQL UDTF (``get_highwater_mark()``, StreamingApp.scala:223-256); this
engine owns all of that natively in Spark so it scales horizontally instead of
funneling through a single database.

Layout:
  sources/    table + stream readers (parquet fixtures, rate/file streams)
  functions/  scalar/column expression helpers (md5, seq-parse, portable hash)
  operators/  batch operators: highwater, relational, queue, worker pipeline,
              dedup, similarity, text analysis, multimodal
  streaming/  Structured Streaming jobs (stateful HW, micro-batch sinks)
  plans/      plan-inspection helpers (explain capture, pushdown asserts)
  catalog.py  the SURVEY.md §2 key → (builder, oracle SQL) registry
"""

__version__ = "0.1.0"
