from .star_schema import TABLES, load, load_all, register_views

__all__ = ["TABLES", "load", "load_all", "register_views"]
