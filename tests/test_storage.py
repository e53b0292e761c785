"""FileStore seam: the ACID layer's atomicity under BOTH fence
implementations (POSIX O_EXCL+hardlink and the rename-based
HDFS-contract store), plus raw-primitive contention.

The commit protocol (reference analog: the transactional claim,
FileWorkerApp.scala:207-227) must not depend on which storage
primitive realizes the fence — every commit path (table manifest,
catalog pointer, stream sink, queue claim, clone/convert) routes
through storage.get_store(), so running the same battery under each
implementation proves the seam is complete: any path still calling a
raw POSIX primitive would pass under 'posix' and break under 'rename'
only if its behavior differed — instead we assert identical outcomes.
"""
import json
import multiprocessing as mp
import threading

import pytest

from spark_streaming_apps_spark.acid import AcidTable
from spark_streaming_apps_spark.storage import (PosixFileStore,
                                                RenameFileStore,
                                                get_store, set_store)


@pytest.fixture(params=["posix", "rename", "faulty"])
def store(request):
    prev = set_store(request.param)
    yield get_store()
    set_store(prev)


# ------------------------------------------------------ raw contract

def test_create_exclusive_contract(store, tmp_path):
    p = tmp_path / "fence.json"
    assert store.create_exclusive(p, '{"v": 1}') is True
    assert p.read_text() == '{"v": 1}'
    assert store.create_exclusive(p, '{"v": 2}') is False
    assert p.read_text() == '{"v": 1}'          # loser never clobbers


def test_link_or_copy_and_replace(store, tmp_path):
    src = tmp_path / "a.bin"
    src.write_bytes(b"immutable")
    store.link_or_copy(src, tmp_path / "b.bin")
    assert (tmp_path / "b.bin").read_bytes() == b"immutable"
    tmp = tmp_path / ".hint.tmp"
    final = tmp_path / "hint"
    final.write_text("old")
    tmp.write_text("new")
    store.atomic_replace(tmp, final)
    assert final.read_text() == "new"
    assert not tmp.exists()


def _race_create(args):
    """One contender process: try to win each of ``n`` fence paths."""
    store_name, root, n, wid = args
    from spark_streaming_apps_spark.storage import set_store, get_store
    set_store(store_name)
    s = get_store()
    wins = []
    for i in range(n):
        if s.create_exclusive(f"{root}/f{i}.json",
                              json.dumps({"winner": wid, "i": i})):
            wins.append(i)
    return wins


@pytest.mark.parametrize("store_name", ["posix", "rename"])
def test_fence_contention_multiprocess(store_name, tmp_path):
    """4 PROCESSES race 32 fence paths: every path gets exactly one
    winner, and the file content is exactly that winner's payload
    (no torn/mixed writes) — the property every manifest swap rests
    on, proven for the fallback store too."""
    n, workers = 32, 4
    with mp.Pool(workers) as pool:
        results = pool.map(_race_create,
                           [(store_name, str(tmp_path), n, w)
                            for w in range(workers)])
    all_wins = [i for wins in results for i in wins]
    assert sorted(all_wins) == list(range(n))      # one winner per path
    for i in range(n):
        rec = json.loads((tmp_path / f"f{i}.json").read_text())
        assert i in results[rec["winner"]]          # content == winner's


# ------------------------------------------- ACID battery, both stores

def test_acid_battery_under_store(store, spark, tmp_path):
    """create → append → merge → delete → clone → convert → restore →
    vacuum → catalog multi-table txn → queue claim: identical outcomes
    under either fence implementation."""
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    t = AcidTable.create(spark, tmp_path / "t", df)
    t.append(spark.createDataFrame([(3, 30.0)], "id long, v double"))
    t.merge(spark.createDataFrame([(3, 33.0), (4, 44.0)],
                                  "id long, v double"), ["id"])
    t.delete_where("id = 1")
    assert {(r.id, r.v) for r in t.read().collect()} == \
        {(2, 20.0), (3, 33.0), (4, 44.0)}
    c = t.clone(tmp_path / "c")
    assert c.read().count() == 3
    # convert-in-place from a plain parquet dir
    plain = tmp_path / "plain"
    spark.createDataFrame([(9,)], "id long").write.parquet(str(plain))
    conv = AcidTable.convert(spark, plain, tmp_path / "conv")
    assert conv.read().count() == 1
    v = t.restore(0)
    assert t.read(v).count() == 2
    t.compact()
    t.vacuum(keep_last=1)
    assert t.read().count() == 2
    # catalog pointer swap
    from spark_streaming_apps_spark.acid_catalog import AcidCatalog
    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("a", spark.createDataFrame([(1,)], "x long"))
    cat.create_table("b", spark.createDataFrame([(1,)], "y long"))
    cat.commit_multi({
        "a": ("append", spark.createDataFrame([(2,)], "x long")),
        "b": ("append", spark.createDataFrame([(2,)], "y long"))})
    assert cat.read("a").count() == 2 and cat.read("b").count() == 2
    # queue claim fence
    from spark_streaming_apps_spark.operators.queue import try_claim
    cdir = tmp_path / "claims"
    cdir.mkdir()
    assert try_claim(cdir, 7, "w1") is True
    assert try_claim(cdir, 7, "w2") is False
    assert (cdir / "7.claim").read_text() == "w1"


def test_concurrent_appends_under_rename_store(spark, tmp_path):
    """Optimistic-commit contention with the FALLBACK fence: two
    threads append disjoint batches concurrently; nothing is lost,
    versions are a serial chain."""
    prev = set_store("rename")
    try:
        t = AcidTable.create(spark, tmp_path / "t",
                             spark.createDataFrame([(-1,)], "id long"))
        errs = []

        def writer(ids):
            try:
                for i in ids:
                    t.append(spark.createDataFrame([(i,)], "id long"))
            except Exception as e:                  # noqa: BLE001
                errs.append(e)
        a = threading.Thread(target=writer, args=(range(0, 8),))
        b = threading.Thread(target=writer, args=(range(8, 16),))
        a.start(); b.start(); a.join(); b.join()
        assert not errs
        assert sorted(r.id for r in t.read().collect()) == \
            list(range(-1, 16))
        assert t.latest_version() == 16             # serial chain
    finally:
        set_store(prev)


# ----------------------------------- object-store double under faults

def test_faulty_store_injects_and_absorbs_transients(tmp_path):
    """The double actually faults (counters prove it) and the client
    retry loop absorbs every transient — including a success lost on
    the response leg, resolved by the etag self-win check instead of
    reported as a phantom lost race."""
    from spark_streaming_apps_spark.storage import FaultyFileStore

    s = FaultyFileStore(fail_every=3, latency_s=0.0)
    wins = 0
    for i in range(40):
        assert s.create_exclusive(tmp_path / f"f{i}.json",
                                  f'{{"i": {i}}}') is True
        wins += 1
        # duplicate PUT of DIFFERENT content still loses
        assert s.create_exclusive(tmp_path / f"f{i}.json",
                                  '{"other": 1}') is False
    assert wins == 40 and s.faults > 10
    # copy-only sharing + unconditional replace survive faults too
    src = tmp_path / "a.bin"
    src.write_bytes(b"x" * 100)
    s.link_or_copy(src, tmp_path / "b.bin")
    assert (tmp_path / "b.bin").read_bytes() == src.read_bytes()
    import os
    assert os.stat(tmp_path / "b.bin").st_nlink == 1   # never a link
    tmp = tmp_path / ".h.tmp"
    tmp.write_text("new")
    s.atomic_replace(tmp, tmp_path / "h")
    assert (tmp_path / "h").read_text() == "new"


def test_faulty_store_threaded_fence_contention(tmp_path):
    """4 threads share one 'server' instance and race 24 fence paths
    under injected faults: exactly one winner per path, content is
    the winner's, no path lost to a transient."""
    from spark_streaming_apps_spark.storage import FaultyFileStore

    s = FaultyFileStore(fail_every=5, latency_s=0.0)
    n, out, errs = 24, {w: [] for w in range(4)}, []

    def contender(wid):
        try:
            for i in range(n):
                if s.create_exclusive(tmp_path / f"f{i}.json",
                                      json.dumps({"w": wid, "i": i})):
                    out[wid].append(i)
        except Exception as e:                       # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=contender, args=(w,)) for w in range(4)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs
    all_wins = sorted(i for wins in out.values() for i in wins)
    assert all_wins == list(range(n))
    for i in range(n):
        rec = json.loads((tmp_path / f"f{i}.json").read_text())
        assert i in out[rec["w"]]


def test_create_exclusive_never_exposes_torn_content(tmp_path):
    """A reader that opens a fence file the INSTANT it exists must see
    the full payload — the manifest-read guarantee every planner poll
    rests on. The naive open(O_EXCL)+write had a torn window here
    (caught by the 4-process rebase-contention test: a sink planner
    read a 0-byte manifest mid-publish)."""
    from spark_streaming_apps_spark.storage import (PosixFileStore,
                                                    RenameFileStore,
                                                    FaultyFileStore)

    payload = json.dumps({"files": ["x"] * 2000})   # big enough to tear
    for store in (PosixFileStore(), RenameFileStore(),
                  FaultyFileStore(fail_every=0, latency_s=0.0)):
        torn, stop = [], threading.Event()
        d = tmp_path / store.name
        d.mkdir()

        def reader():
            seen = set()
            while not stop.is_set():
                for i in range(200):
                    if i in seen:
                        continue
                    p = d / f"f{i}.json"
                    if p.exists():
                        txt = p.read_text()
                        if txt != payload:
                            torn.append((i, len(txt)))
                        seen.add(i)

        th = threading.Thread(target=reader)
        th.start()
        for i in range(200):
            assert store.create_exclusive(d / f"f{i}.json", payload)
        stop.set()
        th.join()
        assert not torn, f"{store.name}: torn reads {torn[:5]}"
