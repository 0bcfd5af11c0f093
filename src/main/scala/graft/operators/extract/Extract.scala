package graft.operators.extract

import org.apache.spark.sql.Dataset

import graft.model.{Mention, RawTriple, Turn}

/** Spark stages S1 (mention detect) + S2 (triple extract): typed flatMap of
  * the pure extractors over Dataset[Turn]. Stateless, deterministic, no
  * shuffle — these stages scale embarrassingly (per-partition map only), which
  * is what lets the 10¹²-turn shape stream through without any exchange
  * before the linking join.
  */
object Extract {

  /** S1: gazetteer mentions. The index is small (≤10⁴ surfaces) and ships to
    * executors via closure broadcast (Spark serializes it once per task set;
    * for very large gazetteers switch to sc.broadcast — same code path).
    */
  def mentions(turns: Dataset[Turn], index: MentionDetector.Index): Dataset[Mention] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    turns.mapPartitions { it =>
      val idx = bc.value
      it.flatMap { t =>
        MentionDetector.detect(t.text, idx).map(s =>
          Mention(t.conv_id, t.turn_idx, s.surface, s.norm, s.begin, s.end))
      }
    }
  }

  /** S2: pattern-based triple extraction (the frozen spec in
    * [[TripleExtractor]]). Pure function of text — turn ordering and ids are
    * carried through untouched, preserving the per-turn invariant.
    */
  def triples(turns: Dataset[Turn]): Dataset[RawTriple] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.flatMap { t =>
      TripleExtractor.extract(t.text).map(e =>
        RawTriple(t.conv_id, t.turn_idx, e.sentIdx, e.subj, e.pred, e.obj))
    }
  }
}
