"""sparksiri — a PySpark-native analytics engine with the query and
data-processing capabilities of SiriDB (siridb-server).

See SURVEY.md for the structural analysis of the reference
(/root/reference, read-only) this engine re-expresses Spark-first.
"""

from .engine import SiriEngine
from .errors import InsertError, ParseError, QueryError, SiriError

__all__ = ["SiriEngine", "QueryError", "InsertError", "ParseError",
           "SiriError"]
__version__ = "0.1.0"
