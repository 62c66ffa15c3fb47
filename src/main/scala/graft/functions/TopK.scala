package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a partial aggregate (SURVEY north-star similarity
  * search, scale path for the exact baseline).
  *
  * A per-qid `row_number` window funnels the whole corpus×query product for
  * one query through ONE task; this Aggregator instead keeps a k-bounded
  * buffer per group, combines map-side (each input partition contributes at
  * most k candidates per group to the shuffle), and merges associatively —
  * the plan is an ObjectHashAggregate with partial + final modes, never a
  * single-partition sort.
  *
  * Ordering is (cos desc, cid asc) — a total order, so the result is
  * deterministic under any partitioning and merge order.
  */
object TopK {

  final case class Neighbor(cid: Long, cos: Double)

  private val ord: Ordering[Neighbor] =
    Ordering.by((n: Neighbor) => (-n.cos, n.cid))

  final class TopKAggregator(k: Int)
      extends Aggregator[Neighbor, ArrayBuffer[Neighbor], Seq[Neighbor]] {
    private def bound(b: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] =
      if (b.length <= k) b
      else {
        val kept = b.sorted(ord).take(k)
        b.clear()
        b ++= kept
      }

    override def zero: ArrayBuffer[Neighbor] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[Neighbor], a: Neighbor): ArrayBuffer[Neighbor] =
      bound(b += a)
    override def merge(b1: ArrayBuffer[Neighbor], b2: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] =
      bound(b1 ++= b2)
    override def finish(b: ArrayBuffer[Neighbor]): Seq[Neighbor] = b.sorted(ord).take(k).toSeq
    override def bufferEncoder: Encoder[ArrayBuffer[Neighbor]] =
      Encoders.kryo[ArrayBuffer[Neighbor]]
    override def outputEncoder: Encoder[Seq[Neighbor]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Neighbor]]()
  }

  /** Column aggregate: top-k (cid, cos) pairs by (cos desc, cid asc),
    * returned as a sorted array<struct<cid,cos>>. */
  def topK(k: Int, cid: Column, cos: Column): Column = {
    val agg = udaf(new TopKAggregator(k), Encoders.product[Neighbor])
    agg(cid.cast("long"), cos.cast("double"))
  }
}
