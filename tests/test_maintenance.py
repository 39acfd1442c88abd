"""Lake-maintenance invariants: compaction changes FILES, never DATA;
retention drops exactly the expired partitions and never reads the rest."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinesis_demo_spark.sinks.maintenance import compact_partition, expire_partitions


def _store(spark, tmp_path, n_files: int = 16):
    path = str(tmp_path / "store")
    df = spark.range(0, 4000).select(
        (F.col("id") % 4).cast("string").alias("day"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    # repartition to force many small files per partition
    df.repartition(n_files).write.partitionBy("day").mode("overwrite").parquet(path)
    return path


def test_compaction_preserves_rows_and_cuts_files(spark, tmp_path):
    path = _store(spark, tmp_path)
    before = spark.read.parquet(path).filter(F.col("day") == "1")
    before_rows = sorted((r.k, r.v) for r in before.collect())

    stats = compact_partition(spark, path, "day", "1", sort_col="k")
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1  # tiny partition -> single target file
    assert stats["rows"] == len(before_rows)

    after = spark.read.parquet(path).filter(F.col("day") == "1")
    assert sorted((r.k, r.v) for r in after.collect()) == before_rows
    # other partitions untouched
    assert spark.read.parquet(path).count() == 4000


def test_compaction_with_sort_clusters_the_sort_key(spark, tmp_path):
    path = _store(spark, tmp_path)
    compact_partition(spark, path, "day", "2", sort_col="k")
    part_dir = os.path.join(path, "day=2")
    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    # single output file; rows inside are sorted by k (clustered layout)
    assert len(files) == 1
    rows = spark.read.parquet(os.path.join(part_dir, files[0])).collect()
    ks = [r.k for r in rows]
    assert ks == sorted(ks)


def test_expire_partitions_drops_only_old(spark, tmp_path):
    path = _store(spark, tmp_path)
    out = expire_partitions(path, "day", keep_from="2")
    assert out["expired"] == ["0", "1"]
    assert out["kept"] == ["2", "3"]
    left = spark.read.parquet(path)
    assert left.select("day").distinct().count() == 2
    assert left.count() == 2000


def test_compaction_unknown_partition_raises(spark, tmp_path):
    path = _store(spark, tmp_path)
    import pytest

    with pytest.raises(FileNotFoundError):
        compact_partition(spark, path, "day", "99")


def test_purge_subject_removes_only_that_subject(spark, tmp_path):
    """GDPR-style purge: the subject's rows vanish everywhere, every other
    row survives bit-identically, and partitions without the subject are
    not rewritten (their files keep their identity)."""
    import os

    from pyspark.sql import functions as F

    from kinesis_demo_spark.io import load_table
    from kinesis_demo_spark.sinks.maintenance import purge_subject

    store = str(tmp_path / "store")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts").cast("string")
    )
    ev.write.partitionBy("day").parquet(store)
    victim = 3
    before = spark.read.parquet(store)
    n_before = before.count()
    n_victim = before.filter(F.col("user_id") == victim).count()
    assert n_victim > 0
    others_before = sorted(
        r.event_id for r in before.filter(F.col("user_id") != victim).collect()
    )
    untouched_parts = {
        d: sorted(os.listdir(os.path.join(store, d)))
        for d in os.listdir(store)
        if d.startswith("day=")
        and spark.read.parquet(os.path.join(store, d))
        .filter(F.col("user_id") == victim)
        .count()
        == 0
    }
    report = purge_subject(spark, store, "day", "user_id", victim)
    after = spark.read.parquet(store)
    assert after.filter(F.col("user_id") == victim).count() == 0
    assert report["rows_purged"] == n_victim
    assert after.count() == n_before - n_victim
    assert sorted(r.event_id for r in after.collect()) == others_before
    for d, files in untouched_parts.items():
        assert sorted(os.listdir(os.path.join(store, d))) == files, d
    assert report["partitions_rewritten"] < report["partitions_scanned"] or not untouched_parts


def test_purge_subject_keeps_null_keyed_rows(spark, tmp_path):
    """ADVICE r5: a plain `!=` kept-filter evaluates to NULL for NULL-keyed
    rows, silently destroying them in every rewritten partition. eqNullSafe
    must keep them (and purging a NULL subject must remove exactly them)."""
    store = str(tmp_path / "store")
    df = spark.createDataFrame(
        [("0", 1, "a"), ("0", None, "n0"), ("0", 2, "b"),
         ("1", 1, "c"), ("1", None, "n1")],
        "day string, user_id int, payload string",
    )
    df.write.partitionBy("day").parquet(store)
    from kinesis_demo_spark.sinks.maintenance import purge_subject

    report = purge_subject(spark, store, "day", "user_id", 1)
    after = spark.read.parquet(store)
    assert report["rows_purged"] == 2
    # NULL-keyed rows survived both rewritten partitions
    assert sorted(r.payload for r in after.collect()) == ["b", "n0", "n1"]

    # purging the NULL subject itself removes exactly the NULL-keyed rows
    report2 = purge_subject(spark, store, "day", "user_id", None)
    assert report2["rows_purged"] == 2
    assert sorted(r.payload for r in spark.read.parquet(store).collect()) == ["b"]


def test_maintenance_crash_recovery_never_fakes_partitions(spark, tmp_path):
    """ADVICE r5: a crash between the two swap renames must not leave a dir
    that parses as a live partition (day=X__old would resurface purged rows
    under a bogus value). Staging/backup are dot-prefixed and the recovery
    sweep rolls back or finishes the swap."""
    import shutil

    from kinesis_demo_spark.sinks.maintenance import (
        _BACKUP_PREFIX,
        _STAGING_PREFIX,
        _recover_incomplete,
        purge_subject,
    )

    store = str(tmp_path / "store")
    df = spark.createDataFrame(
        [("0", 1, "a"), ("0", 2, "b"), ("1", 2, "c")],
        "day string, user_id int, payload string",
    )
    df.write.partitionBy("day").parquet(store)
    baseline = sorted(r.payload for r in spark.read.parquet(store).collect())

    # Simulate a crash after rename #1 (live gone, backup + staging present).
    part = os.path.join(store, "day=0")
    backup = os.path.join(store, _BACKUP_PREFIX + "day=0")
    staging = os.path.join(store, _STAGING_PREFIX + "day=0")
    os.rename(part, backup)
    shutil.copytree(backup, staging)
    # Dot-prefixed names are invisible to the reader even mid-crash.
    assert sorted(
        r.payload for r in spark.read.parquet(store).collect()
    ) == ["c"]

    out = _recover_incomplete(store)
    assert out["rolled_back"] == [_BACKUP_PREFIX + "day=0"]
    assert sorted(r.payload for r in spark.read.parquet(store).collect()) == baseline

    # Simulate a crash after rename #2 (swap done, backup left behind) and
    # verify the next maintenance op self-heals before doing its own work.
    shutil.copytree(part, backup)
    report = purge_subject(spark, store, "day", "user_id", 2)
    assert not os.path.exists(backup)
    assert report["rows_purged"] == 2
    assert sorted(r.payload for r in spark.read.parquet(store).collect()) == ["a"]


def test_recovery_is_scoped_to_the_touched_partition(spark, tmp_path):
    """Code-review r6: per-partition maintenance jobs run concurrently, so
    recovery must never sweep ANOTHER partition's in-flight staging dir."""
    import shutil

    from kinesis_demo_spark.sinks.maintenance import (
        _STAGING_PREFIX,
        compact_partition,
    )

    path = _store(spark, tmp_path)
    # day=3: a concurrent compaction mid-write (staging exists, live intact)
    other_staging = os.path.join(path, _STAGING_PREFIX + "day=3")
    shutil.copytree(os.path.join(path, "day=3"), other_staging)

    compact_partition(spark, path, "day", "1", sort_col="k")

    assert os.path.isdir(other_staging)  # untouched by day=1's recovery
    assert spark.read.parquet(path).count() == 4000


def test_expire_handles_crash_remnants(spark, tmp_path):
    """Code-review r6: a crashed swap's `.old__X` must not let retention
    skip X (the backup would later be rolled back, resurrecting expired —
    or purged — rows); a KEPT partition's backup is rolled back instead."""
    import shutil

    from kinesis_demo_spark.sinks.maintenance import (
        _BACKUP_PREFIX,
        _STAGING_PREFIX,
        expire_partitions,
    )

    path = _store(spark, tmp_path)
    # day=0 crashed between renames: live gone, only the backup remains
    os.rename(os.path.join(path, "day=0"), os.path.join(path, _BACKUP_PREFIX + "day=0"))
    # day=1 crashed mid-write: live + orphan staging
    shutil.copytree(os.path.join(path, "day=1"), os.path.join(path, _STAGING_PREFIX + "day=1"))
    # day=2 crashed between renames but is KEPT: must be rolled back
    os.rename(os.path.join(path, "day=2"), os.path.join(path, _BACKUP_PREFIX + "day=2"))

    out = expire_partitions(path, "day", keep_from="2")
    assert out["expired"] == ["0", "1"]
    assert out["kept"] == ["2", "3"]
    leftovers = [
        d
        for d in os.listdir(path)
        if d.startswith((_BACKUP_PREFIX, _STAGING_PREFIX))
    ]
    assert leftovers == []
    left = spark.read.parquet(path)
    assert sorted(str(r.day) for r in left.select("day").distinct().collect()) == ["2", "3"]
    assert left.count() == 2000


def test_expire_audit_ignores_staging_only_orphans(spark, tmp_path):
    """ADVICE r6: a staging-only remnant (first write crashed before any
    commit — no live dir, no backup) is swept but must NOT be reported as a
    real partition in either `expired` or `kept`: the audit would otherwise
    claim data that never existed."""
    import shutil

    from kinesis_demo_spark.sinks.maintenance import (
        _STAGING_PREFIX,
        expire_partitions,
    )

    path = _store(spark, tmp_path)
    # Fabricate staging-only orphans on BOTH sides of the retention cut, for
    # partition values that were never committed (day=7 expired-side, day=9
    # kept-side).
    shutil.copytree(os.path.join(path, "day=1"), os.path.join(path, _STAGING_PREFIX + "day=0.5"))
    shutil.copytree(os.path.join(path, "day=1"), os.path.join(path, _STAGING_PREFIX + "day=9"))

    out = expire_partitions(path, "day", keep_from="2")
    assert out["expired"] == ["0", "1"]
    assert out["kept"] == ["2", "3"]
    leftovers = [d for d in os.listdir(path) if d.startswith(_STAGING_PREFIX)]
    assert leftovers == []
