"""flink_assignment_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference stream processor
(``alexxhuguett/flink-assignment``, Flink 1.8 / Scala), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, with
Structured Streaming for the streaming execution mode.

Layout:
  session    — SparkSession factory (UTC timezone, AQE, tuned shuffle)
  schemas    — StructTypes for the reference's commit/geo streams and
               the synthetic test tables
  sources    — batch + streaming loaders (parquet, line-delimited JSON)
  functions  — scalar/column helpers (string, date, vector, text)
  operators  — reusable DataFrame→DataFrame operators (windows,
               interval join, CEP follow-by, dedup, similarity, topk)
  queries    — the nine reference queries (commit schema) and their
               synthetic-table analogues wired to the driver contract
  streaming  — Structured Streaming variants of the reference queries
"""

__version__ = "0.1.0"
