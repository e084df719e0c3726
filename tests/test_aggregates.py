"""GROUP BY / aggregate parity with the reference's AggregatesTest
(reference: src/test/scala/AggregatesTest.scala). Expected outputs derived
from SPARQL 1.1 spec semantics + the reference's aggregate error model
(any in-group evaluation error makes SUM/AVG/MIN*expr unbound —
Interpreter.scala:520-870)."""

from .fixtures import GROUP_BY_TTL, SAMPLE_TTL
from .helpers import assert_bag_equal, iri, num, run_sparql

B = "http://books.example/"
D = "http://example.com/data/#"


def test_sum_group_by(spark):
    q = """
    PREFIX : <http://books.example/>
    SELECT ?org (SUM(?lprice) AS ?totalPrice)
    WHERE {
      ?org :affiliates ?auth .
      ?auth :writesBook ?book .
      ?book :price ?lprice .
    }
    GROUP BY ?org"""
    out = run_sparql(spark, GROUP_BY_TTL, q)
    assert_bag_equal(
        out,
        [
            {"org": iri(B + "org1"), "totalPrice": num(21)},
            {"org": iri(B + "org2"), "totalPrice": num(7)},
        ],
    )


def test_count(spark):
    q = """
    PREFIX : <http://books.example/>
    SELECT ?auth (COUNT(?book) AS ?numBooks)
    WHERE { ?auth :writesBook ?book . } GROUP BY ?auth"""
    out = run_sparql(spark, GROUP_BY_TTL, q)
    assert_bag_equal(
        out,
        [
            {"auth": iri(B + "auth1"), "numBooks": num(2)},
            {"auth": iri(B + "auth2"), "numBooks": num(1)},
            {"auth": iri(B + "auth3"), "numBooks": num(1)},
        ],
    )


def test_min(spark):
    # group :y contains a blank node; bnode < any literal in the
    # ValueComparator total order, so MIN(:y group) is the bnode itself
    q = """
    PREFIX : <http://example.com/data/#>
    SELECT ?g (MIN(?p) AS ?min)
    WHERE { ?g :p ?p . } GROUP BY ?g"""
    out = run_sparql(spark, GROUP_BY_TTL, q)
    assert_bag_equal(
        out,
        [
            {"g": iri(D + "x"), "min": num(1)},
            {"g": iri(D + "y"), "min": iri("b2")},
            {"g": iri(D + "z"), "min": num(1.0)},
            {"g": iri(D + "w"), "min": num(1)},
        ],
    )


def test_complex_min(spark):
    # MIN(:y)*2 multiplies a bnode -> type error -> unbound
    q = """
    PREFIX : <http://example.com/data/#>
    SELECT ?x (MIN(?y) * 2 AS ?min)
    WHERE { ?x :p ?y . } GROUP BY ?x"""
    out = run_sparql(spark, GROUP_BY_TTL, q)
    assert_bag_equal(
        out,
        [
            {"x": iri(D + "x"), "min": num(2)},
            {"x": iri(D + "y"), "min": None},
            {"x": iri(D + "z"), "min": num(2.0)},
            {"x": iri(D + "w"), "min": num(2)},
        ],
    )


def test_sum_times_two(spark):
    # SUM over :y hits the bnode -> whole group's sum unbound
    q = """
    PREFIX : <http://example.com/data/#>
    SELECT ?x (SUM(?y) * 2 AS ?sum)
    WHERE { ?x :p ?y . } GROUP BY ?x"""
    out = run_sparql(spark, GROUP_BY_TTL, q)
    assert_bag_equal(
        out,
        [
            {"x": iri(D + "x"), "sum": num(20)},
            {"x": iri(D + "y"), "sum": None},
            {"x": iri(D + "z"), "sum": num(20.0)},
            {"x": iri(D + "w"), "sum": num(12)},
        ],
    )


def test_max_times_two(spark):
    # MAX never errors (total order): :y max is the largest literal 4
    q = """
    PREFIX : <http://example.com/data/#>
    SELECT ?x (MAX(?y) * 2 AS ?max)
    WHERE { ?x :p ?y . } GROUP BY ?x"""
    out = run_sparql(spark, GROUP_BY_TTL, q)
    assert_bag_equal(
        out,
        [
            {"x": iri(D + "x"), "max": num(8)},
            {"x": iri(D + "y"), "max": num(8)},
            {"x": iri(D + "z"), "max": num(8)},
            {"x": iri(D + "w"), "max": num(6)},
        ],
    )


def test_group_concat(spark):
    # pieces sorted (the reference's own test normalizes by sorting —
    # AggregatesTest.scala:74-92); bnode piece concats its label
    q = """
    PREFIX : <http://example.com/data/#>
    SELECT ?x (GROUP_CONCAT(?y; separator=";") AS ?concat)
    WHERE { ?x :p ?y . } GROUP BY ?x"""
    out = run_sparql(spark, GROUP_BY_TTL, q)

    def pieces(row):
        row = dict(row)
        row["concat"] = (tuple(sorted(row["concat"][0].split(";"))),) + row["concat"][1:]
        return row

    got = [pieces(r) for r in out]
    exp = [
        {"x": iri(D + "x"), "concat": (("1", "2", "3", "4"),) },
        {"x": iri(D + "y"), "concat": (("1", "3", "4", "b2"),) },
        {"x": iri(D + "z"), "concat": (("1.0", "2.0", "3.0", "4"),) },
        {"x": iri(D + "w"), "concat": (("1", "2", "3"),) },
    ]
    for e in exp:
        e["concat"] = e["concat"] + ("http://www.w3.org/2001/XMLSchema#string", None)
    assert_bag_equal(got, exp)


def test_avg(spark):
    q = """
    PREFIX : <http://example.com/data/#>
    SELECT ?x (AVG(?y) AS ?avg)
    WHERE { ?x :p ?y . } GROUP BY ?x"""
    out = run_sparql(spark, GROUP_BY_TTL, q)
    assert_bag_equal(
        out,
        [
            {"x": iri(D + "x"), "avg": num(2.5)},
            {"x": iri(D + "y"), "avg": None},
            {"x": iri(D + "z"), "avg": num(2.5)},
            {"x": iri(D + "w"), "avg": num(2)},
        ],
    )


def test_having(spark):
    q = """
    PREFIX : <http://example.com/data/#>
    SELECT ?x (MAX(?y) * 2 AS ?max)
    WHERE { ?x :p ?y . } GROUP BY ?x HAVING(MAX(?y) < 4)"""
    out = run_sparql(spark, GROUP_BY_TTL, q)
    assert_bag_equal(out, [{"x": iri(D + "w"), "max": num(6)}])


def test_sample(spark):
    q = """
    PREFIX : <http://example.com/data/#>
    SELECT ?x (SAMPLE(?y) AS ?sample)
    WHERE { ?x :p ?y . } GROUP BY ?x"""
    out = run_sparql(spark, SAMPLE_TTL, q)
    assert len(out) == 2
    by_x = {r["x"]: r["sample"] for r in out}
    assert by_x[iri(D + "x")] in (num(1), num(2))
    assert by_x[iri(D + "y")] in (num(1), iri("b2"))


def test_multiple_aggregates(spark):
    q = """
    PREFIX : <http://example.com/data/#>
    SELECT ?g (AVG(?p) AS ?avg) ((MIN(?p) + MAX(?p)) / 2 AS ?c)
    WHERE { ?g :p ?p . } GROUP BY ?g"""
    out = run_sparql(spark, GROUP_BY_TTL, q)
    assert_bag_equal(
        out,
        [
            {"g": iri(D + "x"), "avg": num(2.5), "c": num(2.5)},
            {"g": iri(D + "y"), "avg": None, "c": None},
            {"g": iri(D + "z"), "avg": num(2.5), "c": num(2.5)},
            {"g": iri(D + "w"), "avg": num(2), "c": num(2)},
        ],
    )


def test_order_by_on_aggregate_query(spark):
    """The reference *ignores* top-level ORDER BY (README.md:40-41,
    NonSupportedOperationsTest); we implement it for real — result bag is
    identical either way."""
    for direction in ("ASC", "DESC"):
        q = f"""
        PREFIX : <http://books.example/>
        SELECT ?org (SUM(?lprice) AS ?totalPrice)
        WHERE {{
          ?org :affiliates ?auth .
          ?auth :writesBook ?book .
          ?book :price ?lprice .
        }}
        GROUP BY ?org
        ORDER BY {direction}(?totalPrice)"""
        out = run_sparql(spark, GROUP_BY_TTL, q)
        vals = [r["totalPrice"] for r in out]
        assert vals == ([num(7), num(21)] if direction == "ASC" else [num(21), num(7)])
