package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` top-k: per group, keep the k largest
  * (value, id) pairs (descending value, ascending id tie-break) in a
  * bounded buffer.
  *
  * This is the Dataset-typed custom-aggregate extension surface
  * (SURVEY.md §2.8) and the scale-correct shape for "top-k per group"
  * at 100 TB: the buffer is bounded at k on every partial (map-side)
  * aggregate, so the shuffle carries k rows per (group × map task)
  * instead of the whole group — no global window sort.  The window
  * `row_number() ≤ k` formulation (the oracle) sorts every group's
  * full row set at one reducer.
  *
  * Buffer ordering is maintained eagerly (insert-sorted, truncated at
  * k), which keeps reduce O(k) per row and makes merge a bounded
  * merge — the classic bounded-heap contract. */
class TopKPairs(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)],
                     x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length >= k && better(buf.last, x)) buf
    else {
      val (hi, lo) = buf.span(better(_, x))
      (hi ++ (x +: lo)).take(k)
    }
  }

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)],
                      a: (Double, Long)): Seq[(Double, Long)] = insert(b, a)
  override def merge(b1: Seq[(Double, Long)],
                     b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b2.foldLeft(b1)(insert)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
}

object TopKQueries {

  /** Top-3 orders by total price per order priority via the typed
    * bounded-buffer Aggregator; result ≡ the window row_number ≤ 3
    * oracle (ties fully determined by the (price desc, key asc) order). */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val topk = new TopKPairs(3).toColumn.name("topk")
    graft.Tables.orders(spark, dir)
      .select($"o_orderpriority", $"o_totalprice", $"o_orderkey")
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk)
      .flatMap { case (prio, pairs) =>
        pairs.zipWithIndex.map { case ((price, key), i) =>
          (prio, key, price, (i + 1).toLong)
        }
      }
      .toDF("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
      .orderBy($"o_orderpriority", $"rank")
  }

  val qTopkPerGroupOracleSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
      |  FROM orders) r
      |WHERE rank <= 3
      |ORDER BY o_orderpriority, rank""".stripMargin
}
