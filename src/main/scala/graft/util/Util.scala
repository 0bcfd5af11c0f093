package graft.util

import org.apache.spark.sql.SparkSession

/** Deterministic, dependency-free hashing used for id generation and for the
  * splittable generator streams. Stability matters (ids are derived, never
  * assigned by row position — no monotonically_increasing_id anywhere,
  * SURVEY.md §7.6(2)); cross-engine parity does not (ids never face DuckDB).
  */
object Hashing {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv64(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Splittable hash stream: mix a seed with positional fields so any subset
    * of conversations/turns regenerates identically (FIXTURES.md §1).
    */
  def mix(parts: Any*): Long = fnv64(parts.mkString("\u0001"))

  /** Non-negative bounded draw from a mix. */
  def draw(bound: Int, parts: Any*): Int = {
    val h = mix(parts: _*)
    (((h % bound) + bound) % bound).toInt
  }

  /** Uniform double in [0, 1) from a mix. */
  def unit(parts: Any*): Double =
    (mix(parts: _*) >>> 11).toDouble / (1L << 53).toDouble

  /** splitmix64 finalizer: full-avalanche post-mix. FNV-1a alone has weak
    * avalanche on short, similar keys — its low bit is literally the XOR of
    * input-byte parities (the multiplier is odd), and adjacent structured
    * keys give correlated high bits too; that collapsed the LSH hyperplanes
    * into one vector up to sign. Use the finalized variants whenever values
    * must be statistically independent across adjacent keys.
    */
  def avalanche(h0: Long): Long = {
    var z = h0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0, 1) with full avalanche (independent across
    * adjacent keys) — for pseudo-random plane components and the like.
    */
  def unitMixed(parts: Any*): Double =
    (avalanche(mix(parts: _*)) >>> 11).toDouble / (1L << 53).toDouble
}

/** Scoped lifecycle for per-query persisted intermediates (LSH signature /
  * vector tables): operators that must materialize a table consumed several
  * times inside one query register it here instead of calling bare
  * `persist`, and sweep drivers (Bench, Verify) release a session's tracked
  * tables after each query materializes. Without this, a long-lived session
  * sweeping many dedup queries accumulates cached signature tables until LRU
  * eviction — correct, but needless memory pressure at scale.
  *
  * Contract: release(spark) only between queries (after the consumer's
  * action) — a tracked table unpersisted mid-query would silently recompute
  * its plan per consumer, the exact re-inlining minhashLsh materializes to
  * avoid.
  */
object TempCaches {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  private val tracked = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Drop entries whose session has stopped: their cached blocks died with
    * the context, and retaining the DataFrames would pin whole plan/session
    * graphs for the JVM's lifetime in long-lived processes (tests, Bench)
    * whose library callers never call release.
    */
  private def dropStopped(): Unit =
    tracked.filterInPlace(df => !df.sparkSession.sparkContext.isStopped)

  /** Persist (MEMORY_AND_DISK) and register for scoped release. */
  def track(df: DataFrame): DataFrame = synchronized {
    dropStopped()
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  /** Unpersist every tracked table belonging to `spark`. */
  def release(spark: SparkSession): Unit = synchronized {
    dropStopped()
    tracked.filterInPlace { df =>
      val mine = df.sparkSession eq spark
      if (mine) df.unpersist(blocking = false)
      !mine
    }
  }

  /** Tracked-table count for `spark` (test hook). */
  def trackedCount(spark: SparkSession): Int = synchronized {
    tracked.count(_.sparkSession eq spark)
  }
}

object Sessions {
  /** Local session with the settings every entry point shares. Parallelism is
    * the scale knob used for the two-cluster-size scaling evidence
    * (BASELINE.md): same job at local[8] vs local[32].
    */
  def local(cores: Int, shufflePartitions: Int = -1, appName: String = "graft",
      localDir: Option[String] = None): SparkSession = {
    // default: shuffle partitions = cores × GRAFT_SHUFFLE_FACTOR (default 1).
    // A factor > 1 trades scheduling overhead for straggler/tail balance —
    // AQE still coalesces small exchanges, so the factor mainly bounds the
    // LARGEST task of skew-prone stages
    val factor = sys.env.getOrElse("GRAFT_SHUFFLE_FACTOR", "1").toInt
    val sp = if (shufflePartitions > 0) shufflePartitions else cores * factor
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plan strings are rendered for the listener bus on EVERY execution
      // and every AQE plan update even with the UI off; unbounded, a plan
      // carrying big expression trees costs driver-minutes per action
      .config("spark.sql.maxPlanStringLength", "32768")
    // spark.local.dir (shuffle/spill scratch) only applies to the FIRST
    // context in a JVM; Bench points it at tmpfs for the scaling trials
    localDir.foreach(d => b.config("spark.local.dir", d))
    b.getOrCreate()
  }
}
