package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A `FileIndex` whose file set (paths + exact sizes) is supplied by the
  * caller — the lake's commit manifests — so a snapshot scan plans with
  * ZERO filesystem listing or stat calls. `spark.read.parquet(paths)`
  * builds an `InMemoryFileIndex` that lists every path per action (a
  * driver-side job per read — and on an object store at production scale,
  * one LIST round-trip per directory per query). The manifest already
  * knows every live file and its size; this index hands Spark exactly
  * that, the same planning shape Iceberg/Delta use. Split planning,
  * predicate pushdown, and column pruning behave identically — only the
  * metadata round-trips disappear.
  */
final class ManifestFileIndex(files: Seq[(String, Long)]) extends FileIndex {
  private val statuses: Array[FileStatus] = files.map { case (p, len) =>
    // mod-time 0: the lake's data files are immutable once committed, so
    // freshness-by-mtime is meaningless here
    new FileStatus(len, false, 1, 134217728L, 0L, new HPath(p))
  }.toArray
  override def rootPaths: Seq[HPath] = statuses.map(_.getPath).toSeq
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  override def inputFiles: Array[String] = files.map(_._1).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = files.map(_._2).sum
  override def partitionSchema: StructType = new StructType()
}

object ManifestRead {
  /** Parquet scan over an exact, pre-known (path, size) file set. */
  def parquet(spark: SparkSession, files: Seq[(String, Long)],
              schema: StructType): DataFrame = {
    val rel = HadoopFsRelation(
      location = new ManifestFileIndex(files),
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(
      cs, LogicalRelation(rel, isStreaming = false))
  }
}
