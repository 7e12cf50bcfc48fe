"""Analytic query layer (SURVEY §2.I) — the surface the driver verifies.

Every operator family the rebuilt engine exposes is registered here as a
named query: a Spark DataFrame program plus (where SQL-expressible) a
DuckDB oracle string.  Importing this package populates the registry.
"""

from .registry import QUERIES, Query, register  # noqa: F401
from . import tpch  # noqa: F401,E402
from . import tpch2  # noqa: F401,E402
from . import families  # noqa: F401,E402
from . import families2  # noqa: F401,E402
from . import families3  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
from . import llm_ops  # noqa: F401,E402
from . import etl_queries  # noqa: F401,E402
