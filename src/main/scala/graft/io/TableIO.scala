package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-like table layer (SURVEY.md §7.1): Parquet data files + a JSON
  * snapshot-manifest log + an atomically-swapped CURRENT pointer. Gives the
  * snapshot / checkpoint / resume / lineage semantics the north rule
  * requires in this zero-egress sandbox (no Iceberg runtime jar); a real
  * Iceberg catalog drops in behind the same call sites.
  *
  * Layout:
  * {{{
  *   <tableDir>/data/snap-<id>/part-*.parquet   (+ Spark _SUCCESS marker)
  *   <tableDir>/metadata/v<id>.json             (manifest: files, rows, lineage)
  *   <tableDir>/metadata/CURRENT                (atomic pointer → latest id)
  * }}}
  *
  * Manifest JSON is written by hand (no JSON dep) and read back with
  * `spark.read.json` for audit/lineage queries. Commit protocol: data dir is
  * fully written (Spark's job commit gives the _SUCCESS marker), manifest is
  * written, then CURRENT is swapped via atomic rename — a killed run leaves
  * either the old CURRENT (stage incomplete → recompute) or the new one
  * (stage complete → skip), never a half-visible table.
  */
object TableIO {

  final case class FileEntry(path: String, bytes: Long, rows: Long)
  final case class Snapshot(id: Long, parent: Long, stage: String, rows: Long,
      files: Seq[FileEntry], createdMs: Long)

  private def metaDir(t: String): Path = Paths.get(t, "metadata")
  private def dataDir(t: String, id: Long): Path = Paths.get(t, "data", s"snap-$id")

  def currentId(tableDir: String): Option[Long] = {
    val p = metaDir(tableDir).resolve("CURRENT")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** A table is complete iff CURRENT points at a snapshot whose data dir has
    * Spark's _SUCCESS marker and whose manifest exists.
    */
  def isComplete(tableDir: String): Boolean = currentId(tableDir).exists { id =>
    Files.exists(dataDir(tableDir, id).resolve("_SUCCESS")) &&
      Files.exists(metaDir(tableDir).resolve(s"v$id.json"))
  }

  /** row_count of the CURRENT snapshot, read from its manifest (the manifest
    * JSON is written by this object, so a targeted scan is safe).
    */
  def currentRowCount(tableDir: String): Option[Long] = currentId(tableDir).flatMap { id =>
    val m = metaDir(tableDir).resolve(s"v$id.json")
    if (!Files.exists(m)) None
    else {
      val s = new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
      """"row_count":(-?\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }
  }

  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val id = currentId(tableDir).getOrElse(
      throw new IllegalStateException(s"no CURRENT snapshot in $tableDir"))
    spark.read.parquet(dataDir(tableDir, id).toString)
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
    val files = {
      val paths = new java.util.ArrayList[Path](listParquet(dd).asJava)
      paths.parallelStream()
        .map[FileEntry](p => FileEntry(dd.relativize(p).toString, Files.size(p), parquetRows(p)))
        .collect(java.util.stream.Collectors.toList[FileEntry])
        .asScala.toSeq.sortBy(_.path)
    }
    val snap = Snapshot(id, parent, stage, files.map(_.rows).sum, files,
      System.currentTimeMillis())
    Files.createDirectories(metaDir(tableDir))
    writeAtomic(metaDir(tableDir).resolve(s"v$id.json"), manifestJson(snap))
    writeAtomic(metaDir(tableDir).resolve("CURRENT"), id.toString)
    snap
  }

  /** All manifests of a table as a DataFrame (lineage/audit surface). */
  def manifests(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.json(metaDir(tableDir).resolve("v*.json").toString)

  private def listParquet(dir: Path): Seq[Path] = {
    val stream = Files.walk(dir) // must be closed: it holds directory handles
    try stream.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)
    finally stream.close()
  }

  /** Row count from the Parquet footer (no data read). */
  def parquetRows(p: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), new Configuration())
    val r = ParquetFileReader.open(in)
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

  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
