from echo_chambers_detection_spark.sources.tables import load_table, load_tables
from echo_chambers_detection_spark.sources.domain import (
    engagements_from_events,
    users_from_events,
    posts_from_documents,
    post_embeddings,
)

__all__ = [
    "load_table",
    "load_tables",
    "engagements_from_events",
    "users_from_events",
    "posts_from_documents",
    "post_embeddings",
]
