"""Declared query surface: every ``q_*`` slug from SURVEY.md section 2.

Importing this package registers all queries; ``__spark_entry__`` exposes
the registry to the verification driver.
"""

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import for side effect: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import extras  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import cdc  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import sketch_queries  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
from . import storage_queries  # noqa: E402,F401
from . import timeseries_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401


def all_queries():
    return dict(QUERIES)


def all_oracles():
    return dict(ORACLES)
