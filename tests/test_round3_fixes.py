"""Round-3 regression tests for the judge/advisor findings:

1. sqlquery watermark must advance by NATIVE-typed max (a lexicographic
   string max stalls when a numeric id crosses a digit boundary,
   re-ingesting rows on the next poll) —
   receiver/sqlqueryreceiver/logs_receiver.go:261-325.
2. metricstransform match conditions must treat NULL as non-matching,
   not drop the row from both sides of the update/combine split.
3. metricstransform add_label inserts only when the key is absent
   (operation_add_label.go:15) instead of throwing DUPLICATED_MAP_KEY.
4. OTTL flatten upserts on key collision (func_flatten.go PutEmpty
   overwrite) instead of throwing DUPLICATED_MAP_KEY.
5. semconv translate_keys last-wins on rename collision instead of
   failing under mapKeyDedupPolicy=EXCEPTION
   (processor/schemaprocessor/internal/migrate/attributes.go).
6. span_to_attributes numbers named groups by their TRUE Java group
   index (bare capturing groups shift the numbering).
7. k_smallest_exemplars returns the exact K smallest per group with
   O(K) state (no unbounded collect_list).
"""
import json

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.aggregate import (
    k_smallest_exemplars,
)
from opentelemetry_collector_contrib_spark.operators.metricstransform import (
    Operation,
    Transform,
    metrics_transform,
)
from opentelemetry_collector_contrib_spark.operators.schema import (
    translate_keys,
)
from opentelemetry_collector_contrib_spark.operators.span import (
    _group_indices,
    span_to_attributes,
)
from opentelemetry_collector_contrib_spark.sources.sqlquery import (
    SQLQueryReceiver,
)


# -- 1: sqlquery digit-boundary watermark -----------------------------------

def test_sqlquery_watermark_digit_boundary(spark, tmp_path):
    """ids crossing 999 -> 1001: the watermark must not stall at the
    lexicographic max '999' and must not re-read rows."""
    spark.createDataFrame(
        [(i, f"b{i}") for i in range(995, 1000)], "id bigint, body string"
    ).createOrReplaceTempView("boundary_logs")
    store = str(tmp_path / "track.json")
    rx = SQLQueryReceiver(
        sql="SELECT * FROM boundary_logs WHERE id > $1",
        tracking_column="id",
        tracking_start_value="0",
        body_column="body",
        storage_path=store,
    )
    assert rx.poll(spark).count() == 5
    assert rx.tracking_value == "999"
    # second batch arrives with 4-digit ids
    spark.createDataFrame(
        [(i, f"b{i}") for i in range(995, 1003)], "id bigint, body string"
    ).createOrReplaceTempView("boundary_logs")
    second = rx.poll(spark)
    # ONLY the new ids 1000..1002 — a lexicographic max would have
    # returned them AND kept tracking at '999' forever
    assert sorted(r["id"] for r in second.collect()) == [1000, 1001, 1002]
    assert rx.tracking_value == "1002"
    assert rx.poll(spark).count() == 0  # no re-ingestion, no stall
    state = json.load(open(store))
    assert state["tracking_value"] == "1002"
    # dtype is remembered so the restart binds the literal unquoted
    assert state["tracking_dtype"] == "bigint"
    rx2 = SQLQueryReceiver(
        sql="SELECT * FROM boundary_logs WHERE id > $1",
        tracking_column="id",
        tracking_start_value="0",
        body_column="body",
        storage_path=store,
    )
    assert rx2.poll(spark).count() == 0


def test_sqlquery_string_tracking_still_quoted(spark):
    spark.createDataFrame(
        [("a", "x"), ("c", "y")], "k string, body string"
    ).createOrReplaceTempView("str_logs")
    rx = SQLQueryReceiver(
        sql="SELECT * FROM str_logs WHERE k > $1",
        tracking_column="k",
        tracking_start_value="a",
        body_column="body",
    )
    assert rx.poll(spark).count() == 1
    assert rx.tracking_value == "c"
    assert rx.poll(spark).count() == 0


# -- 2/3: metricstransform null-safety --------------------------------------

def _metrics(spark, rows):
    return spark.createDataFrame(
        rows, "metric_name string, labels map<string,string>, value double"
    )


def test_metricstransform_null_match_keeps_rows(spark):
    """A metric whose labels map lacks the match_labels key evaluates
    the condition to NULL; it must survive the update untouched, not
    vanish (reference leaves non-matching metrics untouched)."""
    df = _metrics(
        spark,
        [
            ("m", {"env": "prod"}, 1.0),
            ("m", {"other": "x"}, 2.0),  # no 'env' key -> NULL match
            (None, {"env": "prod"}, 3.0),  # NULL name
        ],
    )
    out = metrics_transform(
        df,
        [
            Transform(
                include="m", match_labels={"env": "prod"}, action="update",
                new_name="m.renamed",
            )
        ],
    ).collect()
    got = {(r["metric_name"], r["value"]) for r in out}
    assert got == {("m.renamed", 1.0), ("m", 2.0), (None, 3.0)}


def test_metricstransform_null_match_combine_keeps_rows(spark):
    df = _metrics(
        spark,
        [
            ("m", {"env": "prod"}, 1.0),
            ("m", {}, 2.0),  # NULL label match -> must stay in `rest`
        ],
    )
    out = metrics_transform(
        df,
        [
            Transform(
                include="m", match_labels={"env": "prod"},
                action="combine", new_name="m.combined",
            )
        ],
    ).collect()
    got = {(r["metric_name"], r["value"]) for r in out}
    assert got == {("m.combined", 1.0), ("m", 2.0)}


def test_metricstransform_add_label_existing_key_is_noop(spark):
    df = _metrics(spark, [("m", {"lab": "old"}, 1.0), ("m", {}, 2.0)])
    out = metrics_transform(
        df,
        [
            Transform(
                include="m", action="update",
                operations=(
                    Operation(
                        action="add_label", new_label="lab", new_value="new"
                    ),
                ),
            )
        ],
    ).collect()
    got = {(r["labels"]["lab"], r["value"]) for r in out}
    # existing value preserved (operation_add_label.go inserts only
    # when absent); missing key gets the new value; no exception
    assert got == {("old", 1.0), ("new", 2.0)}


# -- 4: flatten collision last-wins -----------------------------------------

def test_ottl_flatten_key_collision_upserts(spark):
    from opentelemetry_collector_contrib_spark.functions.ottl_compiler import (
        compile_statements,
    )

    df = spark.createDataFrame(
        [({"a.b": "flat", "a": '{"b":"nested"}'},)],
        "attributes map<string,string>",
    )
    out = compile_statements(["flatten(attributes)"])(df).first()
    # nested expansion comes after the flat entry -> last write wins
    assert out["attributes"] == {"a.b": "nested"}


# -- 5: semconv collision last-wins -----------------------------------------

def test_translate_keys_collision_last_wins(spark):
    df = spark.createDataFrame(
        [
            ({"net.peer.ip": "1.1.1.1", "net.sock.peer.addr": "2.2.2.2"},),
            ({"db.cassandra.keyspace": "ks1", "db.hbase.namespace": "ns1"},),
        ],
        "attributes map<string,string>",
    )
    renames = {
        "net.peer.ip": "net.sock.peer.addr",
        "db.cassandra.keyspace": "db.name",
        "db.hbase.namespace": "db.name",
    }
    out = df.select(
        translate_keys(F.col("attributes"), renames).alias("attributes")
    ).collect()
    # no DUPLICATED_MAP_KEY; last-wins by map entry order (which entry
    # is last after createDataFrame's dict->map conversion is not
    # pinned, so assert the shape + that one source value survived)
    assert set(out[0]["attributes"]) == {"net.sock.peer.addr"}
    assert out[0]["attributes"]["net.sock.peer.addr"] in {"1.1.1.1", "2.2.2.2"}
    assert set(out[1]["attributes"]) == {"db.name"}
    assert out[1]["attributes"]["db.name"] in {"ks1", "ns1"}


# -- 6: span named-group numbering ------------------------------------------

def test_group_indices_accounts_for_bare_groups():
    assert _group_indices(r"(?P<a>x|(y))(?P<b>\d+)") == [("a", 1), ("b", 3)]
    assert _group_indices(r"(\d)(?P<g>\w+)") == [("g", 2)]
    # non-capturing / lookaround / char-class parens don't count
    assert _group_indices(r"(?:x)(?=y)[(](?P<g>\w)") == [("g", 1)]


def test_span_to_attributes_nested_bare_group(spark):
    df = spark.createDataFrame(
        [("ab123", {})], "name string, attributes map<string,string>"
    )
    out = span_to_attributes(df, [r"(?P<word>a(b))(?P<num>\d+)"]).first()
    # without true-index numbering, 'num' would extract group 2 ('b')
    assert out["attributes"] == {"word": "ab", "num": "123"}
    assert out["name"] == "{word}{num}"


# -- 7: bounded exemplars ----------------------------------------------------

def test_k_smallest_exemplars_exact(spark):
    rows = [("t%d" % (i % 3), i * 7 % 101) for i in range(101)]
    df = spark.createDataFrame(rows, "grp string, id int")
    out = {
        r["grp"]: r["exemplar_ids"]
        for r in k_smallest_exemplars(df, ["grp"], "id", k=3).collect()
    }
    naive = {}
    for g, v in rows:
        naive.setdefault(g, []).append(v)
    naive = {g: sorted(vs)[:3] for g, vs in naive.items()}
    assert out == naive
