from . import replication

__all__ = ["replication"]
