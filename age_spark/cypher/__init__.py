from .parser import parse_cypher  # noqa: F401
