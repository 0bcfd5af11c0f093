package graft

import graft.operators.extract.{Extract, MentionDetector}
import graft.sources.TranscriptGen

/** The file-backed gazetteer path (round-4): the vocabulary is generated and
  * written DISTRIBUTED (no driver collect anywhere in src/main), executors
  * load the surface file lazily once per JVM, and detection behaves exactly
  * like the in-memory set index. Proven at the 500k-entity vocabulary cap
  * (TranscriptGen.Config.entityCount's ceiling).
  */
class GazetteerSpec extends SparkTestBase {

  test("file-backed index == set index: identical mentions on the same corpus") {
    val cfg = TranscriptGen.Config(nConv = 25)
    val setIdx = MentionDetector.buildIndex(TranscriptGen.gazetteerSurfaces(cfg))
    val fileIdx = MentionDetector.writeIndexFile(
      TranscriptGen.gazetteerDs(spark, cfg), s"${tmpDir("graft-gaz-eq")}/gazetteer")
    assert(fileIdx.maxGram == setIdx.maxGram)
    val turns = TranscriptGen.turns(spark, cfg)
    val viaSet = Extract.mentions(turns, setIdx).collect().toSet
    val viaFile = Extract.mentions(turns, fileIdx).collect().toSet
    assert(viaSet.nonEmpty && viaFile == viaSet,
      s"diverged: extra=${viaFile.diff(viaSet).take(3)} missing=${viaSet.diff(viaFile).take(3)}")
  }

  test("500k-entity cap: index builds distributed, loads per-JVM, and detects") {
    val cfg = TranscriptGen.Config(nConv = 50, nEntities = 500000)
    val path = s"${tmpDir("graft-gaz-500k")}/gazetteer"
    val idx = MentionDetector.writeIndexFile(TranscriptGen.gazetteerDs(spark, cfg), path)
    // surfaces from both ends of the id space resolve after the lazy load
    val first = TranscriptGen.entity(0)
    val last = TranscriptGen.entity(cfg.entityCount - 1)
    assert(idx.contains(MentionDetector.norm(first.canonical)))
    assert(idx.contains(MentionDetector.norm(last.canonical)))
    assert(!idx.contains("definitely not a gazetteer surface"))
    assert(idx.maxGram >= 2) // person/org names are multi-token
    // the Spark stage runs over it — the broadcast ships only the path
    assert(Extract.mentions(TranscriptGen.turns(spark, cfg), idx).count() > 0)
  }
}
