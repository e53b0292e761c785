"""Round-14 advice fixes: fenced-replay pin correctness and publish
retry idempotency after main moves on."""
from pathlib import Path

from spark_streaming_apps_spark.acid_catalog import AcidCatalog

REPO = str(Path(__file__).resolve().parents[1])


def _df(spark, rows):
    return spark.createDataFrame(rows, "file_id long, status int")


def test_fenced_replay_pins_committed_version_not_latest(spark, tmp_path):
    """A replayed append_txn inside commit_multi must pin the version
    at which the fenced batch ACTUALLY committed — not latest_version(),
    which may include a concurrent transaction's committed-but-unpinned
    version of the same table (publishing that pin would expose one
    half of the other transaction early)."""
    cat = AcidCatalog(spark, tmp_path / "c")
    cat.create_table("q", _df(spark, [(1, 0)]))
    cat.commit_multi({"q": ("append_txn", _df(spark, [(2, 0)]),
                            "app", 0)})                       # q v1
    assert cat.snapshot()["q"] == 1
    # a concurrent transaction's table write commits but never pins
    # (its catalog publish hasn't happened / crashed)
    cat.table("q").append(_df(spark, [(99, 9)]))              # q v2
    # REPLAY of batch 0: fenced (no new table version), and the pin
    # must stay at the fenced batch's own commit (v1) — v2 stays
    # invisible through the catalog until its owner publishes
    cat.commit_multi({"q": ("append_txn", _df(spark, [(2, 0)]),
                            "app", 0)})
    assert cat.snapshot()["q"] == 1
    assert cat.read("q").filter("file_id = 99").count() == 0


def test_txn_version_walks_chain(spark, tmp_path):
    cat = AcidCatalog(spark, tmp_path / "c")
    cat.create_table("q", _df(spark, [(1, 0)]))
    t = cat.table("q")
    assert t.append_txn(_df(spark, [(2, 0)]), "app", 0) == 1
    assert t.append_txn(_df(spark, [(3, 0)]), "app", 1) == 2
    assert t.txn_version("app", 0) == 1
    assert t.txn_version("app", 1) == 2
    assert t.txn_version("app", 7) is None
    assert t.txn_version("other", 0) is None


def test_publish_retry_after_main_write_is_idempotent(spark, tmp_path):
    """A publish retry (crash-after-CAS) must succeed even if a main
    write landed after the publish took effect: main's pin >= the
    branch version on a linear table history means the branch work is
    already visible — not a CommitConflict."""
    cat = AcidCatalog(spark, tmp_path / "c")
    cat.create_table("q", _df(spark, [(1, 0)]))
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "1"}, "file_id = 1")})
    e1 = cat.publish("wap")                       # lands: main pins v1
    assert cat.latest_entry() == e1
    # main moves on AFTER the successful publish
    cat.commit_multi({"q": ("append", _df(spark, [(5, 0)]))})  # v2
    # retry of the already-landed publish: idempotent no-op, and the
    # post-publish main write is untouched
    e2 = cat.publish("wap")
    assert e2 == cat.latest_entry()
    got = {(r.file_id, r.status) for r in cat.read("q").collect()}
    assert (1, 1) in got and (5, 0) in got
