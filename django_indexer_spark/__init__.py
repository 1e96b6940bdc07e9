"""django_indexer_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of PotLock/django-indexer.

The reference (/root/reference) is a Django + Celery + NEAR-Lake streaming
indexer whose query engine is the Django ORM compiling to Postgres. This
package re-expresses its semantics Spark-first:

- ``schemas``    — explicit StructTypes (nothing inferred)
- ``session``    — tuned SparkSession builder
- ``tables``     — fixture/table loading helpers
- ``functions``  — scalar function library (SURVEY.md §2.8)
- ``operators``  — filters/joins/aggregates/windows/sorts/setops (§2.2-§2.7)
                   plus the LLM-data-pipeline extensions (dedup, similarity,
                   text analysis, multimodal plumbing)
- ``sources``    — lake-stream source, checkpoints, idempotent merge (§2.1)
- ``plans``      — the reference's endpoint/beat-job query plans (§3)
- ``streaming``  — Structured Streaming wrappers (§2.9)
"""

__version__ = "0.1.0"
