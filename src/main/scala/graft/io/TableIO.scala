package graft.io

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-like table layer (SURVEY.md §7.1): Parquet data files + a JSON
  * snapshot-manifest log + a CURRENT pointer. Gives the snapshot /
  * checkpoint / resume / lineage semantics the north rule requires in this
  * zero-egress sandbox (no Iceberg runtime jar); a real Iceberg catalog
  * drops in behind the same call sites.
  *
  * All filesystem access goes through the Hadoop `FileSystem` API resolved
  * from the path's scheme + the active session's Hadoop conf — so the same
  * code runs against local disk, HDFS, or S3A on a real cluster (a
  * `java.nio.Files` implementation would silently be local-only).
  *
  * Layout:
  * {{{
  *   <tableDir>/data/snap-<id>/part-*.parquet   (+ Spark _SUCCESS marker)
  *   <tableDir>/metadata/v<id>.json             (manifest: files, rows, lineage)
  *   <tableDir>/metadata/CURRENT                (pointer → latest id)
  * }}}
  *
  * Manifest JSON is written by hand (no JSON dep) and read back with
  * `spark.read.json` for audit/lineage queries. Commit protocol: data dir is
  * fully written (Spark's job commit gives the _SUCCESS marker), the
  * manifest is written — THE commit point — then CURRENT is swapped
  * (tmp-write + rename). Because object stores / HDFS have no
  * atomic-overwrite rename, CURRENT is a hint, not the source of truth:
  * [[currentId]] falls back to scanning `v*.json` manifests for the highest
  * id whose data dir has _SUCCESS, so a crash between manifest write and
  * pointer swap (or a lost pointer) still resolves to a consistent snapshot
  * — never a half-visible table.
  */
object TableIO {

  final case class FileEntry(path: String, bytes: Long, rows: Long)
  final case class Snapshot(id: Long, parent: Long, stage: String, rows: Long,
      files: Seq[FileEntry], createdMs: Long)

  /** Hadoop conf: the active session's (carries fs.s3a.* etc.) when present,
    * else a bare default (still resolves file:// and HDFS from core-site).
    */
  private def hconf: Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsOf(p: Path): FileSystem = p.getFileSystem(hconf)

  private def metaDir(t: String): Path = new Path(t, "metadata")
  private def dataDir(t: String, id: Long): Path = new Path(new Path(t, "data"), s"snap-$id")

  /** Read a small text file; None if absent. */
  def readString(p: Path): Option[String] = {
    val fs = fsOf(p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Write a small text file via tmp + rename (best-effort atomic swap; the
    * caller's commit protocol must not depend on the swap being atomic —
    * see the class doc for how CURRENT recovery works).
    */
  def writeString(target: Path, content: String): Unit = {
    val fs = fsOf(target)
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
  }

  /** A snapshot is committed iff its data dir carries Spark's _SUCCESS
    * marker AND its manifest exists (the manifest write is the commit
    * point; _SUCCESS guards against a dir Spark was still filling).
    */
  private def committed(tableDir: String, id: Long): Boolean = {
    val fs = fsOf(dataDir(tableDir, id))
    fs.exists(new Path(dataDir(tableDir, id), "_SUCCESS")) &&
      fs.exists(new Path(metaDir(tableDir), s"v$id.json"))
  }

  /** All committed snapshot ids, ascending — the time-travel surface
    * (snapshots are never rewritten; [[write]] always creates the next id).
    */
  def snapshotIds(tableDir: String): Seq[Long] = {
    val md = metaDir(tableDir)
    val fs = fsOf(md)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq
      .flatMap(s => "^v(\\d+)\\.json$".r.findFirstMatchIn(s.getPath.getName)
        .map(_.group(1).toLong))
      .filter(committed(tableDir, _))
      .sorted
  }

  /** CURRENT pointer if valid; else recover by scanning manifests for the
    * highest snapshot whose data dir is fully committed (_SUCCESS present).
    */
  def currentId(tableDir: String): Option[Long] = {
    val pointed = readString(new Path(metaDir(tableDir), "CURRENT"))
      .flatMap(s => s.trim.toLongOption)
    pointed.filter(committed(tableDir, _)).orElse(snapshotIds(tableDir).lastOption)
  }

  /** A table is complete iff a snapshot resolves whose data dir has Spark's
    * _SUCCESS marker and whose manifest exists (currentId enforces both).
    */
  def isComplete(tableDir: String): Boolean = currentId(tableDir).isDefined

  /** row_count of the CURRENT snapshot, read from its manifest (the manifest
    * JSON is written by this object, so a targeted scan is safe).
    */
  def currentRowCount(tableDir: String): Option[Long] = currentId(tableDir).flatMap { id =>
    readString(new Path(metaDir(tableDir), s"v$id.json"))
      .flatMap(s => """"row_count":(-?\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong))
  }

  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val id = currentId(tableDir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $tableDir"))
    spark.read.parquet(dataDir(tableDir, id).toString)
  }

  /** Time-travel read of a specific committed snapshot (Iceberg
    * `VERSION AS OF` semantics): snapshot data dirs are immutable once
    * committed — [[write]] never rewrites an id — so any historical
    * pipeline state stays queryable until a retention sweep deletes it.
    */
  def readAt(spark: SparkSession, tableDir: String, snapshotId: Long): DataFrame = {
    if (!committed(tableDir, snapshotId))
      throw new IllegalStateException(
        s"snapshot $snapshotId of $tableDir is not committed " +
          s"(have: ${snapshotIds(tableDir).mkString(",")})")
    spark.read.parquet(dataDir(tableDir, snapshotId).toString)
  }

  /** Write df as the next snapshot of the table. Per-file lineage rows (path,
    * bytes, rows) are harvested from the Parquet footers — metadata only, no
    * extra Spark job over the data.
    */
  def write(df: DataFrame, tableDir: String, stage: String,
      partitionBy: Seq[String] = Nil): Snapshot = {
    val parent = currentId(tableDir).getOrElse(-1L)
    val id = parent + 1
    val dd = dataDir(tableDir, id)
    var w = df.write.mode("overwrite")
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.parquet(dd.toString)
    // footer harvesting is metadata-only but per-file; parallelize on the
    // driver (hundreds of files × ~20ms each would otherwise serialize)
    val conf = hconf
    val files = {
      val paths = new java.util.ArrayList[Path](listParquet(dd).asJava)
      val ddUri = dd.toUri
      paths.parallelStream()
        .map[FileEntry] { p =>
          val fs = p.getFileSystem(conf)
          FileEntry(ddUri.relativize(p.toUri).toString,
            fs.getFileStatus(p).getLen, parquetRows(p, conf))
        }
        .collect(java.util.stream.Collectors.toList[FileEntry])
        .asScala.toSeq.sortBy(_.path)
    }
    val snap = Snapshot(id, parent, stage, files.map(_.rows).sum, files,
      System.currentTimeMillis())
    fsOf(metaDir(tableDir)).mkdirs(metaDir(tableDir))
    // manifest write is the commit point; CURRENT is a recoverable hint
    writeString(new Path(metaDir(tableDir), s"v$id.json"), manifestJson(snap))
    writeString(new Path(metaDir(tableDir), "CURRENT"), id.toString)
    snap
  }

  /** All manifests of a table as a DataFrame (lineage/audit surface). */
  def manifests(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.json(new Path(metaDir(tableDir), "v*.json").toString)

  private def listParquet(dir: Path): Seq[Path] = {
    val fs = fsOf(dir)
    val it = fs.listFiles(dir, true)
    val out = Seq.newBuilder[Path]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet")) out += s.getPath
    }
    out.result().sortBy(_.toString)
  }

  /** Row count from the Parquet footer (no data read). */
  def parquetRows(p: Path, conf: Configuration): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try r.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).sum
    finally r.close()
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def manifestJson(s: Snapshot): String = {
    val files = s.files.map(f =>
      s"""{"path":"${esc(f.path)}","bytes":${f.bytes},"rows":${f.rows}}""").mkString(",")
    s"""{"snapshot_id":${s.id},"parent_id":${s.parent},"stage":"${esc(s.stage)}",""" +
      s""""row_count":${s.rows},"created_ms":${s.createdMs},"files":[$files]}"""
  }
}
