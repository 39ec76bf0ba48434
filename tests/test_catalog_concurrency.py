"""TableSeriesCatalog writer-contract tests (VERDICT r6 item 3 +
ADVICE r6 orphan-dir wedge): the single-maintainer contract is now
executable — stale-snapshot writes are rejected, same-version races
lose deterministically, and crashed-write orphan dirs can never wedge
the next commit."""

import pytest

from dariadb_spark.scheme import (
    ConcurrentCatalogWriteError,
    TableSeriesCatalog,
)


def _mapping(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, base string, dname string, derived_id bigint"
    )


def test_stale_snapshot_scalar_write_rejected(spark, tmp_path):
    path = str(tmp_path / "cat")
    a = TableSeriesCatalog(spark, path)
    b = TableSeriesCatalog(spark, path)
    a.add_param("host1.cpu")  # commits v1; b's snapshot is still v0
    with pytest.raises(ConcurrentCatalogWriteError, match="refresh"):
        b.add_param("host2.cpu")
    # recovery: refresh + re-apply succeeds and sees a's commit
    b.refresh()
    assert b.id_by_param("host1.cpu") == 0
    new_id = b.add_param("host2.cpu")
    assert new_id == 1
    a.refresh()
    assert a.id_by_param("host2.cpu") == 1


def test_stale_snapshot_bulk_write_rejected(spark, tmp_path):
    path = str(tmp_path / "bulkcat")
    a = TableSeriesCatalog(spark, path)
    b = TableSeriesCatalog(spark, path)
    a.register_bulk(_mapping(spark, [(0, "s0", "s0.day", 1000)]))
    with pytest.raises(ConcurrentCatalogWriteError, match="refresh"):
        b.register_bulk(_mapping(spark, [(1, "s1", "s1.day", 1001)]))
    b.refresh()
    b.register_bulk(_mapping(spark, [(1, "s1", "s1.day", 1001)]))
    assert {r.name for r in b.to_df().collect()} == {
        "s0", "s0.day", "s1", "s1.day"
    }


def test_orphan_version_dir_does_not_wedge(spark, tmp_path):
    """A crashed write leaves a v-N dir without _SUCCESS; the next
    commit must allocate PAST it (ADVICE r6: previously the same N was
    recomputed and errorifexists refused it forever)."""
    path = tmp_path / "orphancat"
    cat = TableSeriesCatalog(spark, str(path))
    cat.add_param("a")  # v1
    orphan = path / "v-00000002"
    orphan.mkdir()  # simulated torn write: dir exists, no _SUCCESS
    cat.add_param("b")  # must commit v3, not wedge on v2
    assert (path / "v-00000003" / "_SUCCESS").exists()
    assert cat.id_by_param("b") == 1
    # the dead orphan (below the committed frontier) was swept
    assert not orphan.exists()
    # a fresh reader sees the committed state only
    fresh = TableSeriesCatalog(spark, str(path))
    assert fresh.id_by_param("a") == 0 and fresh.id_by_param("b") == 1


def test_same_version_race_loses_cleanly(spark, tmp_path):
    """If another writer claims the same version number between our
    allocation and our write, the errorifexists write is the
    tie-breaker and the loser gets ConcurrentCatalogWriteError."""
    path = tmp_path / "racecat"
    cat = TableSeriesCatalog(spark, str(path))
    cat.add_param("a")  # v1
    n = cat._next_version()
    # simulate the rival's in-flight claim of the same number
    (path / f"v-{n:08d}").mkdir()
    df = spark.createDataFrame([(0, "a"), (1, "b")], cat._SCHEMA)
    with pytest.raises(ConcurrentCatalogWriteError, match="lost the race"):
        cat._write_version(df, n)
    # in-memory snapshot still pinned at the committed version
    assert cat._current_version == 1


def test_sequential_instances_interleave_with_refresh(spark, tmp_path):
    """The supported multi-writer pattern: refresh-before-write. Two
    maintainers alternating with refresh() never conflict and converge
    on one catalog."""
    path = str(tmp_path / "seqcat")
    a = TableSeriesCatalog(spark, path)
    b = TableSeriesCatalog(spark, path)
    a.add_param("m0")
    b.refresh()
    b.add_param("m1")
    a.refresh()
    a.add_param("m2")
    fresh = TableSeriesCatalog(spark, path)
    assert {r.name: r.id for r in fresh.to_df().collect()} == {
        "m0": 0, "m1": 1, "m2": 2
    }
