"""Query catalog. Importing this package registers every plan module."""

from .registry import ORACLES, QUERIES, query

from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import events as events_plans  # noqa: E402,F401
from . import text as text_plans  # noqa: E402,F401
from . import vectors as vector_plans  # noqa: E402,F401
from . import pipeline as pipeline_plans  # noqa: E402,F401
from . import sampling as sampling_plans  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
