package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

case class WordCnt(word: String, cnt: Long)
case class TopKBuf(items: Seq[WordCnt])

/** Groupwise top-K as a typed Aggregator with an O(k) buffer.
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy(...))
  * <= k`) sorts EVERY group's full contents; this aggregator keeps only the
  * current best k per group through partial aggregation and merge, so
  * memory is O(k·groups) and the shuffle carries at most k rows per group
  * per map partition — the shape that survives a 100 TB group. Ordering:
  * cnt desc, word asc (the reference's ValueThenKeyComparator).
  */
class TopKWords(k: Int)
    extends Aggregator[(Int, String, Long), TopKBuf, Seq[WordCnt]] {

  private def best(a: Seq[WordCnt], b: Seq[WordCnt]): Seq[WordCnt] =
    (a ++ b).sortBy(w => (-w.cnt, w.word)).take(k)

  override def zero: TopKBuf = TopKBuf(Nil)
  override def reduce(b: TopKBuf, x: (Int, String, Long)): TopKBuf = {
    // fast path: buffer full and x can't beat the current k-th item —
    // skip the O(k log k) re-sort (the steady state over a large keyset)
    if (b.items.length >= k) {
      val worst = b.items.last
      if (x._3 < worst.cnt || (x._3 == worst.cnt && x._2 >= worst.word))
        return b
    }
    TopKBuf(best(b.items, Seq(WordCnt(x._2, x._3))))
  }
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf(best(a.items, b.items))
  override def finish(b: TopKBuf): Seq[WordCnt] = b.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[WordCnt]] =
    ExpressionEncoder[Seq[WordCnt]]()
}
