"""Sources: testdata parquet tables, Kafka (batch + streaming), fixtures."""

from logflow.sources.tables import load_table, load_tables, register_views
from logflow.sources.records import records_from_events, numbers_fixture

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "records_from_events",
    "numbers_fixture",
]
