package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata structs. The Spark-side shapes — schema,
  * batching, partition-parallel decode, metadata extraction — are real and
  * tested; the *decoder itself* is a clearly-marked deterministic STUB
  * (this container ships no image/audio libs). Swap [[StubDecoder.decode]]
  * for a real codec (JNI/FFI or a vendored pure-JVM decoder) and nothing
  * else changes.
  */
object Multimodal {

  final case class MediaMeta(format: String, n_bytes: Long, width: Int, height: Int,
      n_frames: Int)
  final case class Decoded(doc_id: Long, meta: MediaMeta, feature: Array[Float])

  /** STUB decoder: parses the 4-byte magic, derives deterministic fake
    * dimensions and a 8-dim "feature" from the payload bytes. Marked stub by
    * contract: replace with a real codec at integration time.
    */
  object StubDecoder {
    def magic(bytes: Array[Byte]): String =
      bytes.take(4).map(b => f"$b%02x").mkString

    def decode(bytes: Array[Byte]): MediaMeta = {
      val h = graft.util.Hashing.fnv64(magic(bytes) + bytes.length)
      MediaMeta(
        format = if (bytes.length % 3 == 0) "png" else if (bytes.length % 3 == 1) "jpeg" else "webp",
        n_bytes = bytes.length.toLong,
        width = 64 + (math.abs(h) % 960).toInt,
        height = 64 + (math.abs(h >> 16) % 960).toInt,
        n_frames = 1)
    }

    def feature(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < bytes.length) { out(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      out
    }
  }

  /** Attach a synthetic binary payload column (UTF-8 of the text) — the test
    * harness's stand-in for real image bytes arriving from an upstream table.
    */
  def withSyntheticPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Partition-parallel decode: binary column → typed metadata + feature
    * vector. Batch shape mirrors a mapInPandas/mapInArrow decode stage:
    * per-partition iteration, one decode per row, no driver involvement.
    */
  def decodeMeta(docs: DataFrame, payloadCol: String, idCol: String): Dataset[Decoded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Decoded(id, StubDecoder.decode(bytes), StubDecoder.feature(bytes))
      })
  }

  /** Pure-native metadata extraction (no decode): byte length + magic hex —
    * the fields derivable without a codec, kept codegen-friendly.
    */
  def nativeMeta(docs: DataFrame, payloadCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      length(col(payloadCol)).cast("long").as("n_bytes"),
      lower(hex(substring(col(payloadCol), 1, 4))).as("magic_hex"))
}
