"""osmexpress_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of bdon/OSMExpress, re-expressed
Spark-first (see SURVEY.md for the full mapping), plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).
"""

__version__ = "0.1.0"

from .session import get_spark

__all__ = ["get_spark", "__version__"]
