"""ariadne-spark — a PySpark-native file-level index engine for data
lakes, built from scratch with the query and data-processing
capabilities of the reference system cjfravel-dev/ariadne (see
SURVEY.md), plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal columns).
"""

from . import catalog
from .context import AriadneConf
from .index import Index
from .sources.datasource import register as register_data_source
from .sql.surface import register_views, sql

__all__ = [
    "Index",
    "AriadneConf",
    "catalog",
    "sql",
    "register_views",
    "register_data_source",
]
__version__ = "0.1.0"
