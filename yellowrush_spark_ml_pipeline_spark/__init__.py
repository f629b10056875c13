"""yellowrush_spark_ml_pipeline_spark — a from-scratch, PySpark-native
analytics engine with the query/data-processing capabilities of
``sdave0/yellowRush-spark-ml-pipeline`` (see SURVEY.md), plus the
LLM-data-pipeline extension operators (dedup, similarity search, text
analysis, multimodal columns), all designed for 100 TB scale.

Layout:
    session    — SparkSession factory (AQE-first, UTC, Arrow)
    schemas    — central StructType registry
    sources    — schema'd readers / partitioned writers
    functions  — scalar / text / vector column-expression layers
    operators  — cleaning, aggregates, joins, features, dedup,
                 similarity, textstats, multimodal
    streaming  — event-time windows, sessionization (batch + streaming)
    ml         — encoding, RF pipelines, evaluation, persistence
    plans      — physical-plan inspection (scale assertions)
"""

from . import functions, ml, operators, plans, schemas, sources, streaming
from .session import get_spark

__all__ = [
    "functions",
    "get_spark",
    "ml",
    "operators",
    "plans",
    "schemas",
    "sources",
    "streaming",
]

__version__ = "0.1.0"
