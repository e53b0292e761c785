"""MERGE schema evolution (Delta's ``withSchemaEvolution``): a
source-only column widens the target schema IN THE SAME COMMIT —
carried and unmatched target rows read NULL there — riding the same
transactional-widening contract as append_evolve. Without the opt-in,
source-only columns are silently dropped (Delta's default too).
"""
import json

import pytest

from spark_streaming_apps_spark.acid import AcidTable


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_merge_evolve_widens_and_null_fills(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10), (2, 20), (3, 30)], "k long, v long"),
        enable_cdf=True)
    v = t.merge(_df(spark, [(2, 99, "m2"), (4, 40, "m4")],
                    "k long, v long, note string"),
                ["k"], evolve_schema=True)
    assert t.read().columns == ["k", "v", "note"]
    got = {(r.k, r.v, r.note) for r in t.read().collect()}
    assert got == {(1, 10, None), (2, 99, "m2"),
                   (3, 30, None), (4, 40, "m4")}
    # time travel keeps each version's own width
    assert t.read(v - 1).columns == ["k", "v"]
    # CDF across the widened commit reads at the NEW width
    ch = t.read_changes(v - 1, v)
    ins = {(r.k, r.v, r.note) for r in ch.filter(
        "_change_type = 'insert'").collect()}
    assert (2, 99, "m2") in ins and (4, 40, "m4") in ins
    # audit trail records the evolution
    h = {r.version: r for r in t.history().collect()}
    assert json.loads(h[v].operation_parameters) == {
        "merge_key": ["k"], "schema_evolution": True}


def test_merge_default_still_drops_source_only_columns(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10)], "k long, v long"))
    t.merge(_df(spark, [(1, 11, "x")], "k long, v long, extra string"),
            ["k"])
    assert t.read().columns == ["k", "v"]
    assert [(r.k, r.v) for r in t.read().collect()] == [(1, 11)]


def test_merge_evolve_type_conflict_refused(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10)], "k long, v long"))
    with pytest.raises(TypeError, match="schema-evolution conflict"):
        t.merge(spark.createDataFrame([(1, 1.5)], "k long, v double"),
                ["k"], evolve_schema=True)


def test_merge_evolve_refuses_case_variant_clash(spark, tmp_path):
    """Partition/constraint/generated columns are always live schema
    columns, so a same-named source column is SHARED (type-checked);
    the reachable hazard is a case-variant name minting a duplicate
    under Spark's case-insensitive resolution — refused."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10)], "k long, v long"))
    with pytest.raises(ValueError, match="case-insensitive clash"):
        t.merge(_df(spark, [(1, 10, 9)], "k long, v long, V long"),
                ["k"], evolve_schema=True)
    # generated columns stay enforced THROUGH the widening commit:
    # the implicit CHECK rides every manifest, so an evolved merge
    # whose rows violate it is refused
    g = AcidTable.create(
        spark, tmp_path / "g",
        _df(spark, [(1, 10)], "k long, v long"),
        generated={"bucket": "k % 4"})
    with pytest.raises(Exception, match="gen_bucket|constraint"):
        g.merge(_df(spark, [(2, 20, 99, "x")],
                    "k long, v long, bucket long, note string"),
                ["k"], evolve_schema=True)
    # a CONFORMING widening merge over the generated table succeeds
    g.merge(_df(spark, [(2, 20, 2, "ok")],
                "k long, v long, bucket long, note string"),
            ["k"], evolve_schema=True)
    assert g.read().columns == ["k", "v", "bucket", "note"]
    got = {(r.k, r.bucket, r.note) for r in g.read().collect()}
    assert got == {(1, 1, None), (2, 2, "ok")}


def test_merge_pruned_evolve_delegates_to_full(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(i, i * 10) for i in range(100)],
            "k long, v long").repartition(4))
    v = t.merge_pruned(_df(spark, [(5, 999, "hit")],
                           "k long, v long, tag string"),
                       ["k"], evolve_schema=True)
    assert t.read().columns == ["k", "v", "tag"]
    assert t.read().filter("tag = 'hit'").count() == 1
    assert t.read().filter("tag IS NULL").count() == 99
    assert t._manifest(v)["op"] == "merge"
    # same-width batch keeps the pruned fast path
    v2 = t.merge_pruned(_df(spark, [(6, 777, None)],
                            "k long, v long, tag string"),
                        ["k"], evolve_schema=True)
    assert t._manifest(v2)["op"] == "merge_pruned"
    assert t.read().filter("k = 6").collect()[0].v == 777


def test_merge_evolve_streaming_reads_across_widening(spark, tmp_path):
    """The CDF stream keeps serving across the widened commit (old
    change files null-fill the new column under the explicit schema)."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10)], "k long, v long"), enable_cdf=True)
    t.append(_df(spark, [(2, 20)], "k long, v long"))
    t.merge(_df(spark, [(3, 30, "w3")], "k long, v long, note string"),
            ["k"], evolve_schema=True)
    ch = t.read_changes(0, t.latest_version())
    assert "note" in ch.columns
    ins = {(r.k, r.note) for r in
           ch.filter("_change_type = 'insert'").collect()}
    assert (3, "w3") in ins
    assert (2, None) in ins


def test_sql_merge_with_schema_evolution(spark, tmp_path):
    """Delta's statement form: MERGE WITH SCHEMA EVOLUTION INTO widens
    the target with source-only columns; the plain statement still
    drops them (and INSERT of an unknown column stays an error)."""
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10), (2, 20)], "k long, v long"))
    spark.createDataFrame([(2, 99, "m2"), (4, 40, "m4")],
                          "k long, v long, note string"
                          ).createOrReplaceTempView("evolve_src")
    acid_sql(spark, """
        MERGE WITH SCHEMA EVOLUTION INTO tbl AS t
        USING evolve_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """, tables={"tbl": t})
    assert t.read().columns == ["k", "v", "note"]
    got = {(r.k, r.v, r.note) for r in t.read().collect()}
    assert got == {(1, 10, None), (2, 99, "m2"), (4, 40, "m4")}

    # plain MERGE: source-only column dropped, no widening
    t2 = AcidTable.create(
        spark, tmp_path / "t2",
        _df(spark, [(1, 10)], "k long, v long"))
    acid_sql(spark, """
        MERGE INTO tbl AS t USING evolve_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """, tables={"tbl": t2})
    assert t2.read().columns == ["k", "v"]


def test_merge_mor_evolve_delegates_on_widening(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10), (2, 20)], "k long, v long"),
                         enable_dv=True)
    v = t.merge_mor(_df(spark, [(2, 99, "w")],
                        "k long, v long, note string"),
                    ["k"], evolve_schema=True)
    assert t._manifest(v)["op"] == "merge"       # delegated: COW widen
    got = {(r.k, r.v, r.note) for r in t.read().collect()}
    assert got == {(1, 10, None), (2, 99, "w")}
    # same-width batch keeps the MOR fast path
    v2 = t.merge_mor(_df(spark, [(3, 30, None)],
                         "k long, v long, note string"),
                     ["k"], evolve_schema=True)
    assert t._manifest(v2)["op"] == "merge_mor"


def test_op_params_thread_isolated(spark, tmp_path):
    """Concurrent statements on ONE handle never stamp each other's
    operationParameters (keyed per thread)."""
    import json
    import threading

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(i, i) for i in range(2000)],
                              "k long, v long").repartition(4))
    errs = []

    def deleter(lo):
        try:
            for i in range(3):
                t.delete_where(f"k >= {lo + i * 10} AND "
                               f"k < {lo + i * 10 + 5}")
        except Exception as e:                   # noqa: BLE001
            errs.append(e)

    a = threading.Thread(target=deleter, args=(0,))
    b = threading.Thread(target=deleter, args=(1000,))
    a.start(); b.start(); a.join(); b.join()
    assert not errs
    h = {r.version: r for r in t.history().collect()}
    for v, row in h.items():
        if row.op != "delete":
            continue
        params = json.loads(row.operation_parameters)
        # every delete commit's recorded predicate matches the rows it
        # actually removed (no cross-thread stamp)
        pred = params["predicate"]
        before = {r.k for r in t.read(v - 1).collect()}
        after = {r.k for r in t.read(v).collect()}
        lo = int(pred.split(">=")[1].split("AND")[0])
        hi = int(pred.split("<")[1])
        assert before - after == {k for k in before
                                  if lo <= k < hi}
