from . import analytics, ingest, maintenance, quality

__all__ = ["analytics", "ingest", "maintenance", "quality"]
