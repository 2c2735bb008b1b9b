package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al.) heavy-hitters aggregate as a
  * TypedImperativeAggregate — the custom-Catalyst AGGREGATE tier
  * (SURVEY §2.11 mechanism table; the Expression and LogicalPlan tiers
  * are CosineSimilarity and AsOfJoinPlan).
  *
  * Why it earns its place at 100 TB: exact per-term counting shuffles
  * every distinct term (the q61 vocabulary shape); SpaceSaving keeps a
  * BOUNDED k-entry summary per partition, merges summaries on the
  * driver-side of the exchange, and still guarantees every term with
  * frequency > n/k survives with `count_est ≥ true ≥ count_est − err`.
  * The buffer serializes compactly between partial and final
  * aggregation like any built-in imperative aggregate.
  *
  * Evictions depend on encounter order, so estimates (never the
  * guarantees) vary with partitioning → rows-only driver check + the
  * guarantee assertions in SketchSpec.
  */
case class SpaceSavingAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(k >= 1 && k <= 100000, s"k=$k out of range")

  // analysis-time type contract: a non-string child fails cleanly at
  // planning instead of a ClassCastException inside executor tasks
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"approx_top_terms needs a STRING term column, got ${child.dataType.sql}")

  type Buf = mutable.HashMap[String, (Long, Long)]

  override def createAggregationBuffer(): Buf = mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some((c, e)) => buf(s) = (c + 1, e)
        case None if buf.size < k => buf(s) = (1L, 0L)
        case None =>
          // evict the minimum-count entry (term asc tie-break keeps the
          // choice deterministic for a fixed encounter order)
          val (minTerm, (minC, _)) = buf.minBy { case (t, (c, _)) => (c, t) }
          buf.remove(minTerm)
          buf(s) = (minC + 1, minC)
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    // Mergeable-summaries merge (Agarwal et al., TODS 2013): a term
    // absent from one summary may have been seen there and evicted
    // with a count of at most that summary's minimum — so absent terms
    // are offset by the minimum (zero for an under-filled summary,
    // which is exact over its partition), and the offset lands in err
    // too. This keeps `count_est ≥ true ≥ count_est − err` valid under
    // multi-partition aggregation; the min-offset also covers terms a
    // previous merge level trimmed, so the top-k trim below needs no
    // extra err inflation.
    val minBuf = if (buf.size < k) 0L else buf.valuesIterator.map(_._1).min
    val minOther =
      if (other.size < k) 0L else other.valuesIterator.map(_._1).min
    val merged: Buf = mutable.HashMap.empty
    (buf.keySet ++ other.keySet).foreach { t =>
      val (c1, e1) = buf.getOrElse(t, (minBuf, minBuf))
      val (c2, e2) = other.getOrElse(t, (minOther, minOther))
      merged(t) = (c1 + c2, e1 + e2)
    }
    buf.clear()
    merged.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k)
      .foreach { case (t, ce) => buf(t) = ce }
    buf
  }

  override def eval(buf: Buf): Any = {
    val rows = buf.toSeq.sortBy { case (t, (c, _)) => (-c, t) }
      .map { case (t, (c, e)) =>
        InternalRow(UTF8String.fromString(t), c, e)
      }
    new GenericArrayData(rows.toArray[Any]): ArrayData
  }

  // length-prefixed raw UTF-8 (writeUTF caps terms at 64 KB and a
  // pathological unbroken token would kill the partial-agg exchange)
  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, (c, e)) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf: Buf = mutable.HashMap.empty
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val t = new String(b, "UTF-8")
      buf(t) = (in.readLong(), in.readLong())
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType),
    StructField("count_est", LongType),
    StructField("err", LongType))))

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {
  import org.apache.spark.sql.{Column, GraftSqlShim}

  /** Column API: bounded-memory approximate top terms per group. */
  def approxTopTerms(c: Column, k: Int): Column =
    GraftSqlShim.column(
      SpaceSavingAgg(GraftSqlShim.expression(c), k).toAggregateExpression())
}
