package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic per-group uniform sampling as a typed [[Aggregator]]
  * (the engine's UDAF tier, SURVEY §2.11): keep the k group members with
  * the SMALLEST hash of their key — "bottom-k by hash" is the mergeable,
  * RNG-free equivalent of reservoir sampling. Uniform because the hash
  * is uniform; deterministic because there is no RNG state to lose on
  * task retry (the property speculative execution demands at 1000
  * executors); mergeable because min-k of a union is min-k of min-k's —
  * so partial aggregation works map-side like any algebraic aggregate.
  * With an md5 hash the exact same sample is replayable by any engine
  * (the DuckDB oracle sorts by the same digest).
  *
  * Input rows are (hashKey, payload); output is the payloads of the k
  * smallest hash keys, in hash order.
  */
object BottomK {

  /** One input row: group key `g`, hash key `h`, payload `v`. */
  final case class Item(g: String, h: String, v: Long)
  final case class Kept(h: String, v: Long)
  final case class Buf(items: List[Kept])

  def bottomK(k: Int): TypedColumn[Item, Seq[Long]] =
    new BottomKAgg(k).toColumn

  final class BottomKAgg(k: Int) extends Aggregator[Item, Buf, Seq[Long]] {
    require(k > 0)
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Item): Buf = trim(Kept(a.h, a.v) :: b.items)
    override def merge(b1: Buf, b2: Buf): Buf = trim(b1.items ++ b2.items)
    private def trim(items: List[Kept]): Buf =
      Buf(items.sortBy(i => (i.h, i.v)).take(k))
    override def finish(r: Buf): Seq[Long] =
      r.items.sortBy(i => (i.h, i.v)).map(_.v)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
