package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.graph.Materialize
import graft.io.TableIO
import graft.model.{LinkedTriple, RawTriple, Turn}
import graft.operators.canon.Canonicalize
import graft.operators.extract.{Extract, MentionDetector}
import graft.operators.link.EntityLinker
import graft.sources.TranscriptGen

/** The end-to-end KG-construction pipeline (SURVEY.md §7.2):
  *
  * {{{
  * transcripts ─► S1 mentions ─► S2 triples ─► S3 linked ─► S4 canon ─► S5 nodes/edges
  * }}}
  *
  * Every stage boundary is a snapshot write through [[TableIO]]; `run` skips
  * any stage whose table is already complete, so a killed run resumes after
  * the last committed stage with zero recomputation (the resumability gate
  * in BASELINE.md). Stage metrics (rows, wall ms, resumed?) are returned and
  * written alongside the tables.
  */
object Pipeline {

  final case class Config(
      workDir: String,
      gen: TranscriptGen.Config,
      useLsh: Boolean = true,
      transcriptsPath: Option[String] = None,
      /** The external table at [[transcriptsPath]] already holds the
        * ordered-read layout (range-partitioned by conv_id, sorted by
        * (conv_id, turn_idx) within partitions — an Iceberg table written
        * with that sort order): read it IN PLACE, treating the input table
        * itself as the committed `transcripts` snapshot. This is the
        * production shape of the north rule ("reads the transcript Iceberg
        * table ordered by (conv_id, turn_idx)"): a job over an existing
        * 10^12-turn table neither re-sorts it nor copies it into its own
        * storage before starting. Only unordered ingest (`inputOrdered =
        * false`) pays the one-time re-layout + snapshot.
        */
      inputOrdered: Boolean = false,
      /** "all": snapshot every stage (resumable, production default);
        * "final": persist intermediates in memory/disk cache and snapshot
        * only nodes/edges — the throughput-bench mode (a real cluster
        * checkpoints to scalable storage; a single local disk would
        * otherwise serialize the scaling measurement).
        */
      checkpoint: String = "all")

  final case class StageRun(stage: String, rows: Long, wallMs: Long, resumed: Boolean)

  final case class Result(workDir: String, stages: Seq[StageRun]) {
    def turns: Long = stages.find(_.stage == "transcripts").map(_.rows).getOrElse(0L)
  }

  private def stageDir(cfg: Config, s: String) = s"${cfg.workDir}/$s"

  /** Run (or resume) the pipeline. Each stage reads its upstream from the
    * committed snapshot — not from the in-memory plan — which is what makes
    * resume exact and keeps per-stage plans short.
    */
  /** Fail-fast guard: a workDir belongs to exactly one config. Resuming with
    * different generator/linking settings would silently serve the old run's
    * tables as if they were the new config's output.
    */
  private def checkConfigFingerprint(cfg: Config): Unit = {
    val fp = Seq(cfg.gen.nConv, cfg.gen.seed, cfg.gen.hubFrac, cfg.gen.aliasNoise,
      cfg.gen.nEntities, cfg.useLsh, cfg.transcriptsPath.getOrElse(""),
      cfg.inputOrdered).mkString("|")
    val p = new org.apache.hadoop.fs.Path(cfg.workDir, "config.fingerprint")
    TableIO.readString(p) match {
      case Some(prev) =>
        if (prev != fp) throw new IllegalStateException(
          s"workDir ${cfg.workDir} was created by a different pipeline config " +
            s"(existing: $prev, requested: $fp); use a fresh workDir or delete this one")
      case None => TableIO.writeString(p, fp)
    }
  }

  /** Canonical stage order for metrics — concurrent stage pairs complete in
    * nondeterministic order, the report shouldn't.
    */
  private val StageOrder = Seq("transcripts", "mentions", "triples", "linked",
    "canon", "nodes", "edges").zipWithIndex.toMap

  /** Free a final-mode stage's checkpoint blocks once every consumer has
    * materialized. localCheckpoint persists at the RDD layer (not the SQL
    * CacheManager), so `df.unpersist` can't reach it — the persisted RDD
    * lives inside the plan's LogicalRDD leaf. Without these releases every
    * stage's blocks stay resident until session teardown, and the peak
    * footprint is the WHOLE pipeline's data instead of ~2 live stages: at
    * 26M turns that pushed a 48g heap into GC collapse (the 32-core config
    * burned 8× the 8-core config's CPU on the same stages). A cluster job
    * has the same obligation — upstream cache blocks are released as the
    * dataflow passes them, whatever the executor count. Snapshot-mode
    * stages read back from parquet (no LogicalRDD leaf) — no-op there.
    */
  private def releaseStage(dfs: DataFrame*): Unit =
    dfs.foreach(_.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    })

  def run(spark: SparkSession, cfg: Config): Result = {
    import spark.implicits._
    GraftFunctions.register(spark)
    checkConfigFingerprint(cfg)
    // dictionary is generated distributed + deduped once, then reused by the
    // broadcast joins of S3/S4/S5
    val dict = TranscriptGen.aliasDictDs(spark, cfg.gen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stages = Seq.newBuilder[StageRun]

    val snapshotAll = cfg.checkpoint != "final"

    def stage(name: String, partitionBy: Seq[String] = Nil, always: Boolean = false)
        (compute: => DataFrame): DataFrame = {
      val dir = stageDir(cfg, name)
      if (snapshotAll || always) {
        if (TableIO.isComplete(dir)) {
          val df = TableIO.read(spark, dir)
          // row count comes from the committed manifest — resumed runs keep
          // real counts in metrics instead of clobbering them with -1
          stages.synchronized {
            stages += StageRun(name, TableIO.currentRowCount(dir).getOrElse(-1L), 0L, resumed = true)
          }
          df
        } else {
          val t0 = System.nanoTime()
          val snap = TableIO.write(compute, dir, name, partitionBy)
          stages.synchronized {
            stages += StageRun(name, snap.rows, (System.nanoTime() - t0) / 1000000, resumed = false)
          }
          TableIO.read(spark, dir)
        }
      } else {
        val t0 = System.nanoTime()
        // materialize AND cut lineage (localCheckpoint ⇒ the downstream
        // stage sees a shallow LogicalRDD scan, mirroring what the snapshot
        // path gives for free). Without the cut, every downstream action
        // re-canonicalizes and re-renders the whole upstream DAG — with the
        // LSH expression trees that was MINUTES of driver-side plan-string
        // building per AQE update (observed as nondeterministic 200-300 s
        // stage stalls in the scaling bench). GRAFT_FINAL_MODE switches the
        // materialization strategy for A/B measurement. Default is the
        // DESERIALIZED checkpoint: MEMORY_AND_DISK_SER made every downstream
        // scan re-pay per-row deserialization — canon reads linked 2-3×, so
        // at 2 cores the SER tax dominated the stage (bench r5 profile:
        // canon 31.4 s @2 SER vs ~12 s deserialized). Rows already stored as
        // compact UnsafeRows; releaseStage() caps residency at ~2 live
        // stages, which is what made SER's heap headroom unnecessary.
        val df = sys.env.getOrElse("GRAFT_FINAL_MODE", "ckpt") match {
          case "persist" =>
            val d = compute.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            d.count()
            d
          case "ckpt" => compute.localCheckpoint(true)
          case _ => compute.localCheckpoint(true,
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        }
        val rows = df.count()
        stages.synchronized {
          stages += StageRun(name, rows, (System.nanoTime() - t0) / 1000000, resumed = false)
        }
        df
      }
    }

    /** Run two INDEPENDENT stages concurrently: Spark's scheduler interleaves
      * the two jobs' tasks, so one stage's straggler tail overlaps the
      * other's work instead of idling the cluster — a pure utilization win
      * at high parallelism (at low parallelism the scheduler simply
      * serializes the ready tasks; A/B'd in StageBench). This is ordinary
      * multi-threaded job submission on one SparkSession — the supported
      * Spark concurrency model — not a custom scheduler.
      */
    def concurrently(a: => DataFrame, b: => DataFrame): (DataFrame, DataFrame) = {
      if (sys.env.contains("GRAFT_NO_CONCURRENT_STAGES")) (a, b) // A/B escape
      else {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val fa = Future(a)
        val fb = Future(b)
        // settle BOTH before surfacing either failure: if a fails while b is
        // mid-write, unwinding immediately would leave b detached, still
        // writing its checkpoint table against a run that is tearing down
        val ra = Await.ready(fa, Duration.Inf).value.get
        val rb = Await.ready(fb, Duration.Inf).value.get
        (ra.get, rb.get)
      }
    }

    // S0 — transcripts, stored range-partitioned by conv_id and sorted by
    // (conv_id, turn_idx) within partitions: the ordered-read invariant.
    // The re-range-partition fires ONLY for externally-ingested tables: the
    // generator's output already HAS the layout (spark.range partitions the
    // ordinal space contiguously, genConv emits turns in turn order, and the
    // zero-padded conv-%08d makes lexicographic order == ordinal order), so
    // repartitionByRange there would cost an extra full generation pass
    // (RangePartitioner sampling) plus a corpus-wide shuffle+sort for a
    // layout we already hold — measured at 21.7M turns it was the single
    // most expensive stage (140 s at local[32]). This mirrors production:
    // an Iceberg table already range-sorted by (conv_id, turn_idx) is read
    // in place; only unpartitioned ingest pays the one-time re-layout.
    val transcripts = cfg.transcriptsPath match {
      // ordered external table: read in place (see Config.inputOrdered). The
      // stage's cost is the row count (parquet metadata scan); the actual
      // column reads happen inside S1/S2, which scan the source table
      // directly — no second copy of the corpus in checkpoint storage.
      case Some(p) if cfg.inputOrdered =>
        val t0 = System.nanoTime()
        val df = spark.read.parquet(p)
        val rows = df.count()
        stages.synchronized {
          stages += StageRun("transcripts", rows, (System.nanoTime() - t0) / 1000000, resumed = false)
        }
        df
      case _ => stage("transcripts") {
        cfg.transcriptsPath match {
          case Some(p) => spark.read.parquet(p)
            .repartitionByRange(col("conv_id"))
            .sortWithinPartitions(col("conv_id"), col("turn_idx"))
          case None => TranscriptGen.turns(spark, cfg.gen).toDF()
        }
      }
    }
    val turns = transcripts.as[Turn]

    // S1 ∥ S2 — mentions and triples both consume only transcripts: run them
    // concurrently so their task sets interleave (both are map-only).
    // Gazetteer: built DISTRIBUTED and file-backed (normalize→dedup→write,
    // executors load it from storage) — the vocabulary never materializes on
    // the driver, which is what lets the 500k-entity cap (and beyond) ship.
    // Written once per workDir; the config fingerprint above already pins
    // workDir↔generator-config, so a committed gazetteer is always current.
    val gazPath = s"${cfg.workDir}/gazetteer"
    val gazetteer: MentionDetector.Index = {
      val fs = new org.apache.hadoop.fs.Path(gazPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(gazPath, "_SUCCESS")))
        new MentionDetector.FileIndex(gazPath)
      else MentionDetector.writeIndexFile(TranscriptGen.gazetteerDs(spark, cfg.gen), gazPath)
    }
    val (mentionsDf, triplesDf) = concurrently(
      stage("mentions") { Extract.mentions(turns, gazetteer).toDF() },
      stage("triples") { Extract.triples(turns).toDF() })
    // transcripts fed only S1/S2; mentions is a terminal output table
    releaseStage(transcripts, mentionsDf)

    // S3 — entity linking (broadcast joins only on the big side).
    val linkedDf = stage("linked") {
      EntityLinker.link(triplesDf.as[RawTriple], dict, cfg.useLsh).toDF()
    }
    releaseStage(triplesDf)

    // S4 — connected-components canonicalization.
    val canonDf = stage("canon") {
      Canonicalize(linkedDf.as[LinkedTriple], dict).toDF()
    }
    releaseStage(linkedDf)
    // Canonicalize tracks its vocabulary-sized intermediates (sides, cmap,
    // CC contract map) in TempCaches; the canon checkpoint above is the last
    // consumer, so drop them before S5's corpus-wide jobs need the memory.
    graft.util.TempCaches.release(spark)

    // S5 — graph materialization; edges partitioned by rel_type (the Spark
    // analog of the reference's typeRelMap scan index).
    val canonTyped = canonDf.as[graft.model.CanonTriple]
    val types = dict.select(col("canonical_name").as("canon_name"), col("entity_type")).distinct()
    lazy val graph = Materialize.graph(canonTyped, Some(types))
    // S5a ∥ S5b — node and edge tables both derive from canon only
    concurrently(
      stage("nodes", always = true) { graph.nodes },
      stage("edges", partitionBy = Seq("rel_type"), always = true) { graph.edges })
    releaseStage(canonDf)
    dict.unpersist(false)

    val result = Result(cfg.workDir,
      stages.result().sortBy(s => StageOrder.getOrElse(s.stage, 99)))
    writeMetrics(cfg, result)
    result
  }

  private def writeMetrics(cfg: Config, r: Result): Unit = {
    val json = r.stages.map(s =>
      s"""{"stage":"${s.stage}","rows":${s.rows},"wall_ms":${s.wallMs},"resumed":${s.resumed}}""")
      .mkString("[", ",", "]")
    TableIO.writeString(new org.apache.hadoop.fs.Path(cfg.workDir, "metrics.json"), json)
  }
}

/** spark-submit entry point: `PipelineMain <workDir> <nConv> [hubFrac]`. */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val workDir = args(0)
    val nConv = args(1).toLong
    val hubFrac = if (args.length > 2) args(2).toDouble else 0.2
    // spark-submit injects spark.master; default to local[*] for direct runs
    val spark = SparkSession.builder().appName("graft-pipeline")
      .config("spark.master", sys.props.getOrElse("spark.master",
        sys.env.getOrElse("GRAFT_MASTER", "local[*]")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "32768")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = Pipeline.run(spark, Pipeline.Config(workDir,
      TranscriptGen.Config(nConv = nConv, hubFrac = hubFrac)))
    r.stages.foreach(s => println(s"[pipeline] ${s.stage}: rows=${s.rows} wallMs=${s.wallMs} resumed=${s.resumed}"))
    spark.stop()
  }
}
