"""streams_prototyping_spark — a PySpark-native analytics/stream engine.

A from-scratch engine with the query and data-processing capability
surface of the reference repo ``apurvam/streams-prototyping`` (Kafka
Streams experimentation apps — see SURVEY.md), re-expressed Spark-first:

- batch DataFrame/SQL for the relational + analytic surface,
- Structured Streaming for the stateful streaming pipelines,
- LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal columns) designed for 100 TB scale.

Everything here derives from public knowledge only: the Apache Spark
API, the reference repo, and published papers.
"""

from streams_prototyping_spark.session import get_spark  # noqa: F401
from streams_prototyping_spark.registry import QUERIES, ORACLES, register  # noqa: F401

__version__ = "0.1.0"
