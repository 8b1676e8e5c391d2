from .registry import ORACLES, QUERIES, query

# Importing the plan modules populates the registry.
from . import relational  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import coverage  # noqa: E402,F401
from . import quality  # noqa: E402,F401

__all__ = ["ORACLES", "QUERIES", "query"]
