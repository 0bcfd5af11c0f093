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
}

object Sessions {
  /** Local session with the settings every entry point shares. Parallelism is
    * the scale knob used for the two-cluster-size scaling evidence
    * (BASELINE.md): same job at local[8] vs local[32].
    */
  def local(cores: Int, shufflePartitions: Int = -1, appName: String = "graft"): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cores
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
