from .json_source import ingest_json, with_object_id
from .tables import FIXTURE_TABLES, load_events, load_table, load_tables

__all__ = [
    "ingest_json",
    "with_object_id",
    "FIXTURE_TABLES",
    "load_events",
    "load_table",
    "load_tables",
]
