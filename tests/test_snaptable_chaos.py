"""Concurrent-writer chaos stress for the snapshot-table commit
protocol (VERDICT r4 #7): N writer threads race randomized
append/delete commits against one table, with crashed-writer states
(data files written, manifest never committed; committed manifest,
stale pointer) injected alongside.  Asserts the manifest chain stays
linear, no successfully-committed row is ever lost, every historical
version stays readable, and vacuum reclaims exactly the crashed
writers' orphans.

Threads, not processes: the races the protocol guards are filesystem-
level (exclusive manifest create, pointer swap), which threads in one
JVM-backed session exercise for real; each writer's own ops are
serialized, and writers only touch their own (wid, seq) rows, so each
writer's expected surviving set is decidable by replaying its own op
log regardless of cross-writer interleaving."""

import random
import threading
import time

from pyspark.sql import functions as F

from dqc_spark import snaptable as st

SCHEMA = "wid int, seq int, payload string"
N_WRITERS = 3
N_OPS = 5


def _retry(fn, max_tries=10):
    for attempt in range(max_tries):
        try:
            return fn()
        except st.CommitConflict:
            time.sleep(0.02 * (attempt + 1))
    raise st.CommitConflict(f"gave up after {max_tries} tries")


def test_concurrent_writer_chaos(spark, tmp_path):
    root = str(tmp_path / "chaos")
    seed_rows = [(-1, -1, "seed")]
    st.create(spark, root, spark.createDataFrame(seed_rows, SCHEMA))

    logs = {w: [] for w in range(N_WRITERS)}  # per-writer serialized op log
    orphan_files = []  # data files of simulated crashed writers
    errors = []

    def writer(wid: int) -> None:
        rng = random.Random(1000 + wid)
        t = st.SnapshotTable(spark, root)
        seq = 0
        try:
            for _ in range(N_OPS):
                op = rng.choice(
                    ["append", "append", "append", "delete", "crash"])
                if op == "append":
                    rows = [(wid, seq + j, f"w{wid}s{seq + j}")
                            for j in range(4)]
                    seq += 4
                    df = spark.createDataFrame(rows, SCHEMA)
                    _retry(lambda: t.append(df))
                    logs[wid].append(("append", rows))
                elif op == "delete":
                    cond = f"wid = {wid} AND seq % 3 = 0"
                    _retry(lambda: t.delete_where(cond))
                    logs[wid].append(("delete", None))
                else:
                    # crashed writer: data files land, manifest never
                    # committed — must be invisible to every reader and
                    # reclaimable by vacuum
                    m = t.manifest()
                    df = spark.createDataFrame(
                        [(wid, 10_000 + seq, "crash")], SCHEMA)
                    files = t._write_data_files(df, m["partition_cols"])
                    orphan_files.extend(fe["path"] for fe in files)
        except Exception as exc:  # surface into the main thread
            errors.append((wid, repr(exc)))

    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(N_WRITERS)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    t = st.SnapshotTable(spark, root)
    head = t.current_version()

    # 1. the manifest chain is LINEAR: versions 1..head contiguous,
    #    each manifest's parent is exactly the previous version
    hist = t.history()
    assert [h["version"] for h in hist] == list(range(1, head + 1))
    for h in hist[1:]:
        assert h["parent"] == h["version"] - 1, h

    # 2. no committed row lost / no uncommitted row visible: each
    #    writer's surviving set = replay of its own serialized op log
    got = {
        w: {r["seq"] for r in rows}
        for w, rows in (
            (w, t.read().filter(F.col("wid") == w).collect())
            for w in range(N_WRITERS)
        )
    }
    for w in range(N_WRITERS):
        want: set[int] = set()
        for op, rows in logs[w]:
            if op == "append":
                want |= {seq for _, seq, _ in rows}
            else:
                want -= {s for s in want if s % 3 == 0}
        assert got[w] == want, (w, sorted(got[w] ^ want))
    # crashed rows (seq >= 10000) never became visible
    assert t.read().filter(F.col("seq") >= 10_000).count() == 0

    # 3. every historical version stays readable and internally
    #    consistent with its manifest's row counts
    for h in hist:
        n = t.read(version=h["version"]).count()
        assert n == h["n_rows"], h

    # 4. stale-pointer crash recovery: a writer that died between
    #    manifest create and pointer swap leaves _current behind;
    #    current_version() must still report the max manifest
    import os

    with open(os.path.join(t.meta, "_current"), "w") as f:
        f.write("1")
    assert st.SnapshotTable(spark, root).current_version() == head

    # 5. vacuum reclaims exactly the crashed writers' orphans (no live
    #    file touched), and the table reads identically afterwards
    before = {w: set(s) for w, s in got.items()}
    removed = set(t.vacuum())
    import os as _os

    assert removed == {_os.path.normpath(p) for p in orphan_files}
    after = {
        w: {r["seq"] for r in t.read().filter(F.col("wid") == w).collect()}
        for w in range(N_WRITERS)
    }
    assert after == before
