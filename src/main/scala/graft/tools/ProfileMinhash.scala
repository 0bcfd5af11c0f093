package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.dedup.Dedup

/** Decompose dd_minhash_full's warm cost: signature table, banding
  * self-join candidates, exact verify. Usage: ProfileMinhash [sfDir] [reps]
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.util.Sessions.local(32, appName = "graft-prof-mh")
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profmh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    (1 to reps).foreach { i =>
      time(s"rep $i sigd persist+count") {
        val sigd = docs.select(col("doc_id").as("id"),
          Dedup.tokenShingles(col("text"), 3).as("sh"))
          .where(size(col("sh")) > 0)
          .withColumn("sig", Dedup.minhashSigFromShingles(col("sh"), 16))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = sigd.count()
        println(s"[profmh]   sigd rows=$n")
        val banded = sigd.select(col("id"),
          explode(transform(sequence(lit(0), lit(3)),
            b => xxhash64((0 until 4).map(j =>
              element_at(col("sig"), b * 4 + j + 1)) :+ b: _*))).as("bucket"))
        val pairs = time(s"rep $i candidates distinct") {
          val p = banded.select(col("bucket"), col("id").as("id_a"))
            .join(banded.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
            .where(col("id_a") < col("id_b"))
            .select(col("id_a"), col("id_b"))
            .distinct()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"[profmh]   candidates=${p.count()}")
          p
        }
        time(s"rep $i exact verify") {
          val n2 = pairs
            .join(sigd.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
            .join(sigd.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
            .withColumn("jaccard",
              size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
                size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
            .where(col("jaccard") >= 0.2)
            .count()
          println(s"[profmh]   pairs>=0.2: $n2")
        }
        pairs.unpersist()
        sigd.unpersist()
      }
    }
    spark.stop()
  }
}
