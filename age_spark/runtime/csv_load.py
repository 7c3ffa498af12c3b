"""Reference-parity CSV loaders — ``load_labels_from_file`` /
``load_edges_from_file`` (``src/backend/utils/load/age_load.c``).

Semantics mirrored from the reference loader:

  - every CSV column (including the consumed ``id`` column) becomes a
    property; loaded VERTICES additionally get ``__id__`` = entry id
    (``create_agtype_from_list``, age_load.c:260 — edges get no ``__id__``,
    ``create_agtype_from_list_i``);
  - ``load_as_agtype=False`` stores every field as a STRING ('' for empty);
    True re-parses each trimmed field as a JSON scalar when it validates
    (``csv_value_to_agtype_value``, age_load.c:218): numbers, true/false,
    null, quoted strings — anything else stays a plain string.  Mixed kinds
    within one column ride in the engine's tagged dynamic struct;
  - path validation (``build_safe_filename`` + existence/extension checks):
    NULL / zero-length names, escape from the base directory, missing
    files, and non-.csv extensions all raise;
  - re-loading ids that already exist in the label raises ``Cannot insert
    duplicate vertex id: <graphid>`` (the reference's PK violation);
  - malformed row widths raise (edge files: at least the 4 endpoint
    columns and no more than the header; label files: no more than the
    header) — checked textually on quote-free lines, one pass.

Scale note: loads are one narrow pass over the file; the only driver
actions are the row count (sequence allocation), the width check, and the
duplicate probe — all load-time-only, never per-query.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import ENTRY_ID_BITS, CatalogError
from ..graph import ORDER_KEY_TYPE, Graph

_EDGE_HEAD = ("start_id", "start_vertex_type", "end_id", "end_vertex_type")


def validate_csv_path(path: Optional[str], base_dir: Optional[str]) -> str:
    if path is None:
        raise CatalogError("file path must not be NULL")
    if path == "":
        raise CatalogError("file name cannot be zero length")
    if base_dir is not None:
        base = os.path.normpath(base_dir)
        full = os.path.normpath(os.path.join(base, path))
        if not full.startswith(base + os.sep):
            raise CatalogError(f"You can only load files located in [{base_dir}].")
    else:
        full = path
    # existence before extension: the reference reports a missing .txt as
    # does-not-exist, an existing one as the extension error
    if not os.path.exists(full):
        raise CatalogError(f"File or path does not exist [{full}]")
    if not full.endswith(".csv"):
        raise CatalogError("You can only load files with extension [.csv].")
    return full


def _read_csv(spark, full: str, delimiter: str) -> DataFrame:
    df = (
        spark.read.option("header", True)
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .csv(full)
    )
    # trim header names; drop columns from EMPTY header fields (trailing
    # commas — the reference skips them, age_load.c:291)
    for c in df.columns:
        t = c.strip()
        if t != c:
            df = df.withColumnRenamed(c, t)
    drop = [c for c in df.columns if c == "" or c.startswith("_c")]
    if drop:
        df = df.drop(*drop)
    return df


def _check_row_widths(spark, full: str, delimiter: str, kind: str) -> None:
    """Textual width check (quote-free lines only — quoted fields may hold
    the delimiter legitimately)."""
    lines = spark.read.text(full)
    first = lines.limit(1).collect()
    if not first:
        return
    header = first[0][0]
    n_header = header.count(delimiter) + 1
    if kind == "edge" and n_header < 4:
        raise CatalogError(
            "edge file must have at least 4 columns (start_id, "
            "start_vertex_type, end_id, end_vertex_type)"
        )
    import re as _re

    counts = (
        lines.filter(~F.col("value").contains('"'))
        .filter(F.col("value") != F.lit(header))
        .filter(F.length("value") > 0)
        .select(
            # F.split takes a REGEX — escape so '|' splits on pipes, not
            # on every character
            F.size(F.split(F.col("value"), _re.escape(delimiter), -1)).alias("n")
        )
        .agg(F.min("n").alias("lo"), F.max("n").alias("hi"))
        .first()
    )
    if counts is None or counts["lo"] is None:
        return
    if kind == "edge":
        if counts["lo"] < 4:
            raise CatalogError(
                f"edge file row has {counts['lo']} columns; expected at "
                f"least 4 and no more than the header's {n_header}"
            )
        if counts["hi"] > n_header:
            raise CatalogError(
                f"edge file row has {counts['hi']} columns; expected at "
                f"least 4 and no more than the header's {n_header}"
            )
    elif counts["hi"] > n_header:
        raise CatalogError(
            f"label file row has {counts['hi']} columns, more than the "
            f"header's {n_header} columns"
        )


def _tagged(k, n=None, i=None, s=None, b=None, j=None):
    return F.struct(
        F.lit(k).cast("tinyint").alias("__k"),
        (n if n is not None else F.lit(None).cast("double")).alias("__n"),
        (i if i is not None else F.lit(None).cast("long")).alias("__i"),
        F.lit(None).cast("string").alias("__d"),
        (s if s is not None else F.lit(None).cast("string")).alias("__s"),
        (b if b is not None else F.lit(None).cast("boolean")).alias("__b"),
        F.lit(None).cast(ORDER_KEY_TYPE).alias("__o"),
        (j if j is not None else F.lit(None).cast("string")).alias("__j"),
    )


def csv_value_to_agtype(t):
    """One trimmed CSV field re-parsed as agtype when it validates
    (csv_value_to_agtype_value, age_load.c:218 — ANY valid JSON, containers
    included, the reference gates on json_validate): NULL/empty and the
    literal ``null`` are the agtype null KIND (a present key with null
    value, not an absent key); numbers keep the int/float distinction;
    ``[...]``/``{...}`` that parse as JSON load as container kinds (the
    __j payload); anything not valid JSON is a plain string."""
    is_int = t.rlike(r"^-?[0-9]+$")
    is_flt = t.rlike(r"^-?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][-+]?[0-9]+)?$")
    is_qstr = t.rlike(r'^".*"$')
    unq = F.get(F.from_json(F.concat(F.lit("["), t, F.lit("]")), "array<string>"), 0)
    # container branch: fields shaped like JSON containers re-parse through
    # the variant reader; invalid ones (try_parse_json null) stay strings
    cj = F.to_json(F.try_parse_json(t))
    is_arr = t.startswith("[") & cj.isNotNull()
    is_obj = t.startswith("{") & cj.isNotNull()
    return (
        F.when(t.isNull() | (t == "") | (t == "null"), _tagged(8))
        .when(t == "true", _tagged(6, b=F.lit(True)))
        .when(t == "false", _tagged(6, b=F.lit(False)))
        .when(is_int, _tagged(7, n=t.cast("double"), i=t.cast("long")))
        .when(is_flt, _tagged(7, n=t.cast("double")))
        .when(is_obj, _tagged(3, j=cj))
        .when(is_arr, _tagged(4, j=cj))
        .when(is_qstr & unq.isNotNull(), _tagged(5, s=unq))
        .otherwise(_tagged(5, s=t))
    )


def _prop_cols(df: DataFrame, skip: tuple, load_as_agtype: bool) -> list:
    out = []
    for c in df.columns:
        if c in skip:
            continue
        t = F.col(c).cast("string")
        if load_as_agtype:
            out.append(csv_value_to_agtype(t).alias(c))
        else:
            out.append(F.coalesce(t, F.lit("")).alias(c))
    return out


def _label_kind_guard(graph: Graph, label: str, want_vertex: bool) -> None:
    m = graph.meta.labels.get(label)
    if m is None:
        return
    from ..catalog import EDGE_KIND, VERTEX_KIND

    if want_vertex and m.kind == EDGE_KIND:
        raise CatalogError(f'label "{label}" already exists as edge label')
    if not want_vertex and m.kind == VERTEX_KIND:
        raise CatalogError(f'label "{label}" already exists as vertex label')


def load_labels_from_file(
    graph: Graph,
    label: str,
    path: Optional[str],
    id_field_exists: bool = True,
    load_as_agtype: bool = False,
    delimiter: str = ",",
    base_dir: Optional[str] = None,
) -> Graph:
    full = validate_csv_path(path, base_dir)
    _label_kind_guard(graph, label, want_vertex=True)
    spark = graph.spark
    _check_row_widths(spark, full, delimiter, "label")
    df = _read_csv(spark, full, delimiter)
    meta = graph.create_vlabel(label)
    if id_field_exists:
        if "id" not in df.columns:
            raise CatalogError("id field is missing from the label file")
        # the reference consumes ONE sequence value at setup to read the
        # current position (nextval_internal, ag_load_labels.c:201) — even
        # when the load later fails; later no-id loads observe the gap
        meta.allocate(1)
        df = df.withColumn("__entry", F.col("id").cast("long"))
    else:
        n = df.count()
        first = meta.allocate(max(n, 1))
        w = Window.orderBy(F.monotonically_increasing_id())
        df = df.withColumn("__entry", F.row_number().over(w) + F.lit(first - 1))
    shift = meta.label_id << ENTRY_ID_BITS
    existing = graph.vertex_dfs.get(label)
    if id_field_exists:
        # the reference's PK index rejects BOTH re-loads of existing ids and
        # duplicate ids within one file — probe the incoming batch against
        # itself (one aggregate) and against the current label table
        dup_ids = df.groupBy("__entry").agg(F.count(F.lit(1)).alias("_n"))
        if existing is not None:
            dup_ids = dup_ids.unionByName(
                df.select(F.col("__entry"))
                .join(
                    existing.select((F.col("id") - F.lit(shift)).alias("__entry")),
                    "__entry",
                    "left_semi",
                )
                .groupBy("__entry")
                .agg(F.lit(2).alias("_n"))
            )
        dup = (
            dup_ids.filter(F.col("_n") > 1)
            .agg(F.min("__entry").alias("e"))
            .first()
        )
        if dup is not None and dup["e"] is not None:
            raise CatalogError(
                f"Cannot insert duplicate vertex id: {shift + dup['e']}"
                f" (entry id {dup['e']} is already used)"
            )
    props = _prop_cols(df, ("__entry",), load_as_agtype)
    loaded = df.select(
        F.col("__entry"),
        F.col("__entry").alias("__id__"),  # age_load.c:276
        *props,
    )
    graph.add_vertices(label, loaded, id_col="__entry")
    return graph


def load_edges_from_file(
    graph: Graph,
    label: str,
    path: Optional[str],
    load_as_agtype: bool = False,
    delimiter: str = ",",
    base_dir: Optional[str] = None,
) -> Graph:
    full = validate_csv_path(path, base_dir)
    _label_kind_guard(graph, label, want_vertex=False)
    spark = graph.spark
    _check_row_widths(spark, full, delimiter, "edge")
    df = _read_csv(spark, full, delimiter)
    missing = [c for c in _EDGE_HEAD if c not in df.columns]
    if missing:
        raise CatalogError(
            "edge file must have at least 4 columns (start_id, "
            "start_vertex_type, end_id, end_vertex_type)"
        )
    from ..catalog import VERTEX_KIND

    # endpoint packing: (vertex_type, entry id) -> graphid through the
    # catalog's label-id map, applied as a broadcast map literal — the
    # direct-pack fast path of age_load.c:653
    lmap = {
        m.name: m.label_id
        for m in graph.meta.labels.values()
        if m.kind == VERTEX_KIND
    }
    mapping = F.create_map(
        *[x for nm, lid in lmap.items() for x in (F.lit(nm), F.lit(lid))]
    )
    df = df.withColumn(
        "_start", mapping[F.col("start_vertex_type")].cast("long")
        * F.lit(1 << ENTRY_ID_BITS) + F.col("start_id").try_cast("long")
    ).withColumn(
        "_end", mapping[F.col("end_vertex_type")].cast("long")
        * F.lit(1 << ENTRY_ID_BITS) + F.col("end_id").try_cast("long")
    )
    # an unresolvable endpoint must ERROR, never load a NULL graphid — the
    # reference's get_label_id returns INVALID_LABEL_ID and make_graphid
    # rejects it ('label_id must be 1 ..', graphid.c:204); a non-numeric
    # entry id fails the int cast the same way.  One load-time aggregate.
    bad = (
        df.filter(F.col("_start").isNull() | F.col("_end").isNull())
        .select(
            F.coalesce(
                F.when(
                    mapping[F.col("start_vertex_type")].isNull(),
                    F.col("start_vertex_type"),
                ),
                F.when(
                    mapping[F.col("end_vertex_type")].isNull(),
                    F.col("end_vertex_type"),
                ),
            ).alias("_badlabel"),
            F.coalesce(
                F.when(F.col("start_id").try_cast("long").isNull(), F.col("start_id")),
                F.when(F.col("end_id").try_cast("long").isNull(), F.col("end_id")),
            ).alias("_badid"),
        )
        .first()
    )
    if bad is not None:
        if bad["_badlabel"] is not None:
            raise CatalogError(
                f'vertex type "{bad["_badlabel"]}" does not exist '
                f"(label_id must be 1 .. 65535)"
            )
        raise CatalogError(
            f"invalid vertex entry id in edge file: {bad['_badid']!r}"
        )
    props = _prop_cols(
        df, _EDGE_HEAD + ("_start", "_end"), load_as_agtype
    )
    loaded = df.select(F.col("_start"), F.col("_end"), *props)
    graph.add_edges(label, loaded, start_col="_start", end_col="_end")
    # endpoint ENTRY ids are not checked against the vertex tables (the
    # reference's loader doesn't either) — a dangling edge is possible, so
    # the pattern compiler must not prune vertex joins on this graph
    graph.integrity = False
    return graph
