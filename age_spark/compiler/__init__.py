from .clauses import compile_query  # noqa: F401
