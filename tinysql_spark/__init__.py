"""tinysql_spark — a PySpark-native analytics engine with the query
surface of pingcap-incubator/tinysql (reference at /root/reference),
re-expressed Spark-first, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal).
"""

from .engine import Engine, Result  # noqa: F401
from .session import get_spark  # noqa: F401
