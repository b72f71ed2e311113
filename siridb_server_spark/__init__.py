"""sparksiri — a PySpark-native analytics engine with the query and
data-processing capabilities of SiriDB (siridb-server).

See SURVEY.md for the structural analysis of the reference
(/root/reference, read-only) this engine re-expresses Spark-first.
"""

from .engine import SiriEngine
from .errors import InsertError, ParseError, QueryError, SiriError


def register_datasource(spark) -> None:
    """Register the ``siridb`` format on a session:
    ``spark.read/readStream/write/writeStream.format("siridb")``.
    (Lazy import so the core engine has no dependency on the
    DataSource module.)"""
    from .sources.datasource import register

    register(spark)


__all__ = ["SiriEngine", "QueryError", "InsertError", "ParseError",
           "SiriError", "register_datasource"]
__version__ = "0.1.0"
