"""fineventstream_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
MantissaMr/fineventstream (an AWS Kinesis/Lambda/S3 event-ingest pipeline,
see /root/reference) as an idiomatic Apache Spark engine:

- ring [R]: the reference's pipeline semantics (decode, project, filter,
  stateful dedup, partitioned sink) as composable DataFrame transforms and
  Structured Streaming queries  (`sources/`, `sinks/`, `streaming/`);
- ring [P]: the full ANSI-SQL analytics surface the reference plans via
  Athena (joins, aggregation, windows, set ops, scalar functions)
  (`queries/`);
- ring [N]: LLM-data-pipeline operators designed for 100 TB scale —
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search, text analysis, multimodal column plumbing
  (`operators/`).

Everything is declarative DataFrame/SQL first: Catalyst + Tungsten pick the
physical strategy; pandas UDFs appear only where built-ins cannot express
the semantics.
"""

from fineventstream_spark.session import get_spark
from fineventstream_spark.catalog import load_table, load_tables, TABLES

__all__ = ["get_spark", "load_table", "load_tables", "TABLES"]
__version__ = "0.1.0"
