from . import star_queries

__all__ = ["star_queries"]
