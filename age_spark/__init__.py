"""age_spark — a PySpark-native openCypher property-graph analytics engine.

Re-expresses the query surface of Apache AGE (reference: /root/reference,
AGE 1.8.0) on Spark DataFrames: Cypher parses to an AST, compiles to
DataFrame operations, and Catalyst/AQE plan the physical execution. See
SURVEY.md for the capability map and file:line citations into the reference.
"""

from .api import AgeSession, CypherResult  # noqa: F401
from .graph import Graph, create_graph  # noqa: F401
from .catalog import pack_graphid, label_id_of, entry_id_of  # noqa: F401
from .generators import (  # noqa: F401
    create_barbell_graph,
    create_complete_graph,
    create_subgraph,
)
from .algorithms import connected_components, pagerank, triangle_count  # noqa: F401
from .runtime.agvalue import agtype_out  # noqa: F401

__version__ = "0.1.0"
