package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-on-read resolution under randomized (seeded) schedules: any
  * interleaving of delta commits, copy-on-write commits, and threshold
  * compactions must resolve to exactly the last-writer-wins key→value map,
  * at the head and at any time-travel point.
  */
class LakeMorSpec extends SparkSpec {
  import spark.implicits._

  test("random delta/COW schedules resolve to last-writer-wins at every epoch") {
    (1 to 5).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val t = new LakeTable(tmpDir(s"mor-prop-$seed") + "/t", numBuckets = 3,
        keyColumns = Seq("k"), mergeOnRead = true, compactThreshold = 2)
      val keys = ('a' to 'f').map(_.toString)
      var expectedAt = Map.empty[Long, Map[String, Long]] // epoch → lww map
      var current = Map.empty[String, Long]

      (0L until 6L).foreach { epoch =>
        val picked = rng.shuffle(keys).take(1 + rng.nextInt(keys.size))
        val upserts = picked.map(k => (k, epoch * 100 + rng.nextInt(100).toLong))
        val df = upserts.toDF("k", "v")
        if (rng.nextBoolean()) t.mergeDelta(df, epoch)
        else t.merge(df, epoch) // COW interleave: physically resolves buckets
        current = current ++ upserts.toMap
        expectedAt += (epoch -> current)
      }

      // head + every historical epoch resolve to the expected map
      expectedAt.foreach { case (epoch, want) =>
        val got = t.snapshot(spark, asOf = epoch)
          .select("k", "v").as[(String, Long)].collect().toMap
        assert(got == want, s"seed=$seed asOf=$epoch: $got != $want")
      }
      // compaction actually bounded the per-bucket file count
      val perBucket = t.latestManifest().get.files.groupBy(_.bucket).map(_._2.size)
      assert(perBucket.forall(_ <= 2 * 2), s"seed=$seed files per bucket: $perBucket")
    }
  }

  test("COW merge on a multi-version MOR table carries the RESOLVED version once") {
    val t = new LakeTable(tmpDir("cow-on-mor") + "/t", numBuckets = 1,
      keyColumns = Seq("k"), mergeOnRead = true)
    t.mergeDelta(Seq(("a", 1L), ("b", 1L)).toDF("k", "v"), epoch = 0L)
    t.mergeDelta(Seq(("a", 2L), ("b", 2L)).toDF("k", "v"), epoch = 1L) // 2 versions each
    // COW commit upserting only "b": "a" must carry as ONE row, the LATEST
    t.merge(Seq(("b", 9L)).toDF("k", "v"), epoch = 2L)
    val rows = LakeTable.readSnapshot(t, spark).as[(String, Long)]
      .collect().sorted.toSeq
    assert(rows == Seq(("a", 2L), ("b", 9L)), s"got $rows")
    // physical layout after COW is fully resolved too (one row per key)
    assert(t.latestManifest().get.files.map(_.rows).sum == 2)
  }

  test("changesSince returns exactly the row versions committed in the range") {
    val t = new LakeTable(tmpDir("changes") + "/t", numBuckets = 2,
      keyColumns = Seq("k"), mergeOnRead = true, compactThreshold = 2)
    t.mergeDelta(Seq(("a", 0L), ("b", 0L)).toDF("k", "v"), epoch = 0L)
    t.mergeDelta(Seq(("a", 1L)).toDF("k", "v"), epoch = 1L)
    t.mergeDelta(Seq(("b", 2L), ("c", 2L)).toDF("k", "v"), epoch = 2L)
    t.mergeDelta(Seq(("a", 3L)).toDF("k", "v"), epoch = 3L) // forces compaction too

    val changes = t.changesSince(spark, sinceEpoch = 0L)
      .select("k", "v", "_commit_epoch").as[(String, Long, Long)].collect().toSet
    assert(changes == Set(("a", 1L, 1L), ("b", 2L, 2L), ("c", 2L, 2L), ("a", 3L, 3L)),
      s"got $changes")
    // bounded range
    val upTo2 = t.changesSince(spark, sinceEpoch = 1L, asOf = 2L)
      .select("k", "v").as[(String, Long)].collect().toSet
    assert(upTo2 == Set(("b", 2L), ("c", 2L)))
    // a COW rewrite must NOT re-report carried (unchanged) rows
    t.merge(Seq(("d", 4L)).toDF("k", "v"), epoch = 4L)
    val afterCow = t.changesSince(spark, sinceEpoch = 3L)
      .select("k", "v").as[(String, Long)].collect().toSet
    assert(afterCow == Set(("d", 4L)), s"carried rows re-reported: $afterCow")

    // append-only tables stream too (compaction keeps per-row stamps)
    val app = new LakeTable(tmpDir("changes-app") + "/t", numBuckets = 2,
      keyColumns = Seq("k"), compactThreshold = 2)
    (0L until 6L).foreach(e => app.appendNew(Seq((s"k$e", e)).toDF("k", "v"), e))
    val appChanges = app.changesSince(spark, sinceEpoch = 3L)
      .select("k").as[String].collect().toSet
    assert(appChanges == Set("k4", "k5"), s"got $appChanges")
  }

  test("point lookup reads one bucket only and returns the resolved row") {
    val t = new LakeTable(tmpDir("lookup") + "/t", numBuckets = 8,
      keyColumns = Seq("k"), mergeOnRead = true)
    val keys = (0 until 40).map(i => s"k$i")
    t.mergeDelta(keys.map(k => (k, 1L)).toDF("k", "v"), epoch = 0L)
    t.mergeDelta(Seq(("k3", 2L)).toDF("k", "v"), epoch = 1L) // newer version

    val hit = t.lookup(spark, Map("k" -> "k3"))
    assert(hit.select("k", "v").as[(String, Long)].collect().toSeq == Seq(("k3", 2L)))
    // the read touches a strict subset of the table's files (bucket pruning)
    val allFiles = LakeTable.readSnapshot(t, spark).inputFiles.length
    val hitFiles = hit.inputFiles.length
    assert(hitFiles < allFiles, s"lookup read $hitFiles of $allFiles files")
    // a missing key resolves to empty, not an error
    assert(t.lookup(spark, Map("k" -> "nope")).isEmpty)
  }

  test("rebucket preserves per-row commit stamps (change stream survives)") {
    val t = new LakeTable(tmpDir("rebucket-changes") + "/t", numBuckets = 2,
      keyColumns = Seq("k"))
    (0L until 4L).foreach(e => t.appendNew(Seq((s"k$e", e)).toDF("k", "v"), e))
    t.rebucket(spark, newNumBuckets = 8, epoch = 4L)
    assert(t.currentNumBuckets == 8)
    val changes = t.changesSince(spark, sinceEpoch = 1L)
      .select("k", "_commit_epoch").as[(String, Long)].collect().toSet
    assert(changes == Set(("k2", 2L), ("k3", 3L)),
      s"stamps must survive the rebucket rewrite: $changes")
  }

  test("append-only compaction bounds file counts and preserves every row") {
    val t = new LakeTable(tmpDir("append-compact") + "/t", numBuckets = 2,
      keyColumns = Seq("k"), compactThreshold = 3)
    (0L until 10L).foreach { e =>
      t.appendNew(Seq((s"k$e", e)).toDF("k", "v"), epoch = e)
    }
    val m = t.latestManifest().get
    val perBucket = m.files.groupBy(_.bucket).map(_._2.size)
    // jittered threshold: hard bound 2t
    assert(perBucket.forall(_ <= 2 * 3),
      s"append-only buckets must compact: ${m.files}")
    val rows = LakeTable.readSnapshot(t, spark).as[(String, Long)].collect().toSet
    assert(rows == (0L until 10L).map(e => (s"k$e", e)).toSet)
    assert(m.lineage("totalRows") == 10L)
  }

  test("schema evolution through delta commits: old rows null-fill, resolution holds") {
    val t = new LakeTable(tmpDir("mor-evo") + "/t", numBuckets = 2,
      keyColumns = Seq("k"), mergeOnRead = true)
    t.mergeDelta(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), epoch = 0L)
    // epoch 1 widens the schema AND re-upserts one key
    t.mergeDelta(Seq(("b", 3L, "x"), ("c", 4L, "y")).toDF("k", "v", "extra"), epoch = 1L)
    val m = t.latestManifest().get
    assert(m.schemaId == 2)
    val snap = LakeTable.readSnapshot(t, spark).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2))))
    assert(snap.toSeq == Seq(("a", 1L, None), ("b", 3L, Some("x")), ("c", 4L, Some("y"))))
  }
}
