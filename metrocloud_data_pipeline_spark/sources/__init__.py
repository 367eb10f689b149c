from .generator import simulate_readings, simulate_stream
from .raw_json import parse_raw_json_column, read_raw_json, stream_raw_json
from .star_schema import TABLES, load, load_all, register_views

__all__ = [
    "TABLES",
    "load",
    "load_all",
    "register_views",
    "parse_raw_json_column",
    "read_raw_json",
    "simulate_readings",
    "simulate_stream",
    "stream_raw_json",
]
