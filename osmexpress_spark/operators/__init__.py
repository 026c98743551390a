from . import closure, edges, extract

__all__ = ["closure", "edges", "extract"]
