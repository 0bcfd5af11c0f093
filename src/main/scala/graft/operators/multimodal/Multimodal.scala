package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata structs. The Spark-side shapes — schema,
  * batching, partition-parallel decode, metadata extraction — are real and
  * tested. Decoding: PNG metadata is decoded for REAL ([[PngDecoder]] parses
  * the IHDR chunk per the PNG spec — works on any real PNG); other formats
  * fall back to a clearly-marked deterministic STUB (this container ships no
  * jpeg/webp/audio codecs). Swap [[StubDecoder.decode]] for a real codec
  * (JNI/FFI or a vendored pure-JVM decoder) and nothing else changes.
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

  /** REAL PNG metadata decoder: verifies the 8-byte PNG signature and the
    * IHDR chunk tag, then reads width/height as big-endian u32 at byte
    * offsets 16/20 (PNG spec: signature, 4-byte chunk length, "IHDR",
    * width, height). Only IHDR fields are read, so this handles any real
    * PNG file, not just the synthetic fixtures.
    */
  object PngDecoder {
    val Signature: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def isPng(bytes: Array[Byte]): Boolean =
      bytes.length >= 24 &&
        Signature.indices.forall(i => bytes(i) == Signature(i)) &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R'

    private def beInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    def decode(bytes: Array[Byte]): MediaMeta =
      MediaMeta("png", bytes.length.toLong, beInt(bytes, 16), beInt(bytes, 20), 1)
  }

  /** Attach a synthetic binary payload column (UTF-8 of the text) — the test
    * harness's stand-in for real image bytes arriving from an upstream table.
    */
  def withSyntheticPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Attach a minimal-but-real PNG payload (signature + IHDR) whose
    * dimensions derive from the id column — the oracle-checkable fixture for
    * [[PngDecoder]]: DuckDB recomputes width/height from the id while the
    * engine must actually parse the bytes. Built from native functions
    * (unhex over hex strings) — no UDF, codegen'd.
    */
  def withSyntheticPngPayload(docs: DataFrame, idCol: String): DataFrame = {
    val width = (pmod(col(idCol).cast("long"), lit(1000L)) + 1).cast("int")
    val height = (pmod(col(idCol).cast("long") * 7, lit(1000L)) + 1).cast("int")
    val hexStr = concat(
      lit("89504E470D0A1A0A"), // PNG signature
      lit("0000000D"), // IHDR chunk length = 13
      lit("49484452"), // "IHDR"
      lpad(hex(width), 8, "0"),
      lpad(hex(height), 8, "0"),
      lit("0806000000")) // bit depth 8, color type 6, compression/filter/interlace 0
    docs.withColumn("payload", unhex(hexStr))
  }

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
        val meta = if (PngDecoder.isPng(bytes)) PngDecoder.decode(bytes)
          else StubDecoder.decode(bytes) // non-PNG formats remain stubbed
        Decoded(id, meta, StubDecoder.feature(bytes))
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
