package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k as a typed Aggregator (SURVEY §2.11 — the one custom
  * typed aggregate the plan admits): a bounded buffer per group,
  * trimmed at 2k so insertion is O(1) amortized and merge is a concat
  * + trim. Compared with the window row_number approach, the partial
  * aggregate ships at most 2k rows per group per partition instead of
  * the group's full contents — at 100 TB that is the difference
  * between a k-sized and a data-sized shuffle.
  *
  * Ordering is (score DESC, id ASC) — identical to the window variant
  * so the two plans are interchangeable (SimilaritySpec asserts it).
  * Buffers ride through the shuffle kryo-encoded (opaque but small:
  * ≤2k Scored values per group).
  */
object TopK {

  case class Scored(id: Long, score: Double)

  private def trim(buf: Seq[Scored], k: Int): Seq[Scored] =
    buf.sortBy(s => (-s.score, s.id)).take(k)

  class TopKAggregator(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = {
      val next = buf :+ a
      if (next.length > 2 * k) trim(next, k) else next
    }
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      trim(a ++ b, k)
    override def finish(buf: Seq[Scored]): Seq[Scored] = trim(buf, k)
    override def bufferEncoder: Encoder[Seq[Scored]] = Encoders.kryo[Seq[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] = Encoders.kryo[Seq[Scored]]
  }
}
