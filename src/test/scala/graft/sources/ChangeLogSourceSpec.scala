package graft.sources

import graft.SparkSpec
import graft.cdc.{ChangeLogGen, GenConfig}

class ChangeLogSourceSpec extends SparkSpec {
  import spark.implicits._

  test("gzip CSV round-trips the change log bit-for-bit (S1/S2)") {
    val cfg = GenConfig(numConversations = 40, hotConversations = 1, hotFragments = 16)
    val events = ChangeLogGen.generate(spark, cfg)
    val dir = tmpDir("csvlog")
    ChangeLogSource.writeCsv(events, dir)
    // files really are gzip
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv.gz"))
    assert(files.nonEmpty, "expected .csv.gz part files")
    val back = ChangeLogSource.readCsv(spark, dir)
    assert(back.count() == events.count())
    val a = events.collect().sortBy(_.offset)
    val b = back.collect().sortBy(_.offset)
    assert(a.toSeq == b.toSeq)
  }

  test("multi-path read unions several daily files (S2)") {
    val cfg = GenConfig(numConversations = 20, hotConversations = 0, hotFragments = 1)
    val events = ChangeLogGen.generate(spark, cfg)
    val d1 = tmpDir("day1"); val d2 = tmpDir("day2")
    ChangeLogSource.writeCsv(events.filter(_.epoch <= 1), d1)
    ChangeLogSource.writeCsv(events.filter(_.epoch >= 2), d2)
    val both = ChangeLogSource.readCsv(spark, d1, d2)
    assert(both.count() == events.count())
  }
}
