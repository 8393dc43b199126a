"""datapipelinerepo_spark — a PySpark-native analytics & pipeline engine.

From-scratch re-homing of the capability surface of
osteensco/DataPipelineRepo (reference: /root/reference) onto Spark:

- relational operators (SURVEY.md §2) as composable DataFrame functions
  (``operators/``, ``functions/``),
- source ingestion + write semantics (``sources/``, ``io``),
- the schedule→extract→load orchestrator (``plans/``),
- the event-ingest path on Structured Streaming (``streaming/``),
- LLM-data-pipeline extensions: dedup, similarity search, text analysis,
  multimodal columns (``operators/dedup.py`` etc.).

The reference rents its query engine from BigQuery and transforms in
pandas; here every relational query is a Catalyst-optimized DataFrame
plan and every transform is JVM-side (built-in functions) or
Arrow-batched (pandas UDFs). No code is copied from the reference; file:line
citations in docstrings point at the *behavior* being re-expressed.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
