"""CSV bulk loaders (load_labels_from_file / load_edges_from_file parity —
age_load.c:565/653; fixture format mirrors regress/age_load/data/*.csv:
vertices carry an id column + properties, edges carry
start_id,start_vertex_type,end_id,end_vertex_type + properties)."""

import os

import pytest

from age_spark import AgeSession


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("age_csv")
    (d / "countries.csv").write_text(
        "id,name,iso\n1,Austria,AT\n2,Belgium,BE\n3,Chile,CL\n"
    )
    (d / "cities.csv").write_text(
        "id,name\n10,Vienna\n11,Graz\n12,Brussels\n13,Santiago\n"
    )
    (d / "edges.csv").write_text(
        "start_id,start_vertex_type,end_id,end_vertex_type,since\n"
        "10,City,1,Country,1156\n11,City,1,Country,1128\n"
        "12,City,2,Country,979\n13,City,3,Country,1541\n"
    )
    return str(d)


def test_csv_round_trip(spark, csv_dir):
    age = AgeSession(spark)
    g = age.create_graph("geo")
    g = age.load_vertices_from_csv(g, "Country", os.path.join(csv_dir, "countries.csv"), id_col="id")
    g = age.load_vertices_from_csv(g, "City", os.path.join(csv_dir, "cities.csv"), id_col="id")
    g = age.load_edges_from_csv(g, "IN_COUNTRY", os.path.join(csv_dir, "edges.csv"),
                                start_label="City", end_label="Country")

    got = sorted(
        tuple(r) for r in age.cypher(
            g,
            "MATCH (c:City)-[e:IN_COUNTRY]->(k:Country) "
            "RETURN c.name AS city, k.iso AS iso, e.since AS since",
        ).df.collect()
    )
    assert got == [
        ("Brussels", "BE", 979),
        ("Graz", "AT", 1128),
        ("Santiago", "CL", 1541),
        ("Vienna", "AT", 1156),
    ]


def test_csv_load_then_create_no_id_collision(spark, csv_dir):
    age = AgeSession(spark)
    g = age.create_graph("geo2")
    g = age.load_vertices_from_csv(g, "Country", os.path.join(csv_dir, "countries.csv"), id_col="id")
    g2 = age.cypher(g, "CREATE (c:Country {name: 'Denmark', iso: 'DK'})").graph
    got = sorted(
        r.iso for r in age.cypher(g2, "MATCH (c:Country) RETURN c.iso AS iso").df.collect()
    )
    assert got == ["AT", "BE", "CL", "DK"]


def test_csv_conversion_edge_cases(spark, tmp_path):
    """Type-conversion fixture cases (FIXTURES.md G1 /
    regress/age_load conversion_vertices.csv): quoted vs bare booleans,
    ints, floats, scientific notation, doubled-quote escapes."""
    p = tmp_path / "conv.csv"
    p.write_text(
        'id,s,b,num\n'
        '1,"""John""",true,1\n'
        '2,plain,false,-2\n'
        '3,"quoted,comma",true,1.4\n'
        '4,x,false,-1e10\n'
    )
    age = AgeSession(spark)
    g = age.create_graph("conv")
    g = age.load_vertices_from_csv(g, "T", str(p), id_col="id")
    got = sorted(
        tuple(r) for r in age.cypher(
            g, "MATCH (n:T) RETURN n.s AS s, n.b AS b, toFloat(n.num) AS num"
        ).df.collect()
    )
    assert got == [
        ('"John"', True, 1.0),
        ("plain", False, -2.0),
        ("quoted,comma", True, 1.4),
        ("x", False, -1e10),
    ]


def test_graph_save_load(spark, csv_dir, tmp_path):
    age = AgeSession(spark)
    g = age.create_graph("geo3")
    g = age.load_vertices_from_csv(g, "Country", os.path.join(csv_dir, "countries.csv"), id_col="id")
    path = str(tmp_path / "geo3")
    g.save(path)
    g2 = age.load_graph(path)
    got = sorted(r.name for r in age.cypher(g2, "MATCH (c:Country) RETURN c.name AS name").df.collect())
    assert got == ["Austria", "Belgium", "Chile"]


def test_intra_file_duplicate_vertex_id_raises(spark, tmp_path):
    """Duplicate ids WITHIN one CSV file must raise — the reference's PK
    index rejects them just like re-loads of existing ids."""
    from age_spark.catalog import CatalogError

    p = tmp_path / "dup.csv"
    p.write_text("id,name\n1,a\n2,b\n1,c\n")
    age = AgeSession(spark)
    g = age.create_graph("dupv")
    with pytest.raises(CatalogError, match="duplicate vertex id"):
        age.load_labels_from_file(g, "T", str(p))


def test_edge_unknown_vertex_type_raises(spark, tmp_path):
    """An unknown start/end_vertex_type must ERROR (get_label_id ->
    INVALID_LABEL_ID -> make_graphid 'label_id must be 1 ..',
    graphid.c:204), never load NULL endpoints."""
    from age_spark.catalog import CatalogError

    v = tmp_path / "v.csv"
    v.write_text("id,name\n1,a\n")
    e = tmp_path / "e.csv"
    e.write_text(
        "start_id,start_vertex_type,end_id,end_vertex_type\n1,T,1,Nope\n"
    )
    age = AgeSession(spark)
    g = age.create_graph("badet")
    g = age.load_labels_from_file(g, "T", str(v))
    with pytest.raises(CatalogError, match='"Nope" does not exist'):
        age.load_edges_from_file(g, "E", str(e))


def test_edge_non_numeric_entry_id_raises(spark, tmp_path):
    from age_spark.catalog import CatalogError

    v = tmp_path / "v.csv"
    v.write_text("id,name\n1,a\n")
    e = tmp_path / "e.csv"
    e.write_text(
        "start_id,start_vertex_type,end_id,end_vertex_type\nxyz,T,1,T\n"
    )
    age = AgeSession(spark)
    g = age.create_graph("badid")
    g = age.load_labels_from_file(g, "T", str(v))
    with pytest.raises(CatalogError, match="invalid vertex entry id"):
        age.load_edges_from_file(g, "E", str(e))


def test_load_as_agtype_containers(spark, tmp_path):
    """load_as_agtype=True accepts ANY valid JSON (json_validate,
    age_load.c:218): '[1,2]' / '{"a":1}' fields load as agtype containers,
    not plain strings; malformed near-JSON stays a string."""
    p = tmp_path / "cont.csv"
    p.write_text(
        'id,val\n'
        '1,"[1, 2, 3]"\n'
        '2,"{""a"": 1}"\n'
        '3,"[1, 2"\n'
    )
    age = AgeSession(spark)
    g = age.create_graph("contv")
    g = age.load_labels_from_file(g, "T", str(p), load_as_agtype=True)
    got = {
        r.id: (r.sz, r.a)
        for r in age.cypher(
            g,
            # size() RAISES on the object row like age_size
            # (agtype.c:7627) — guard it behind CASE so the other rows'
            # container semantics stay observable
            "MATCH (n:T) RETURN toInteger(n.id) AS id, "
            "CASE WHEN toInteger(n.id) <> 2 THEN size(n.val) END AS sz, "
            "toInteger(n.val['a']) AS a",
        ).df.collect()
    }
    # [1,2,3] is a real array (size 3); {"a":1} derefs a; the malformed
    # field stays a 5-char string
    assert got[1][0] == 3
    assert got[2][1] == 1
    assert got[3][0] == 5


def test_tpch_schemas_match_embedded(spark):
    """demo.build_tpch_graph reads with embedded schemas (skipping footer
    inference, guide §5); this pins them against the actual files on every
    SF dir so generator drift is caught here, not at bench time."""
    import os

    from age_spark.demo import TPCH_SCHEMAS

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        base = f"/root/testdata/{sf}"
        if not os.path.isdir(base):
            continue
        for name, ddl in TPCH_SCHEMAS.items():
            inferred = spark.read.parquet(f"{base}/{name}.parquet").schema
            declared = spark.read.schema(ddl).parquet(
                f"{base}/{name}.parquet"
            ).schema
            assert inferred == declared, (sf, name, inferred, declared)
