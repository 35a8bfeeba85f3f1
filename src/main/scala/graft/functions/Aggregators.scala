package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.7): custom aggregation the built-in
  * set lacks, expressed as an `Aggregator` so Spark plans it with
  * partial (map-side) aggregation + merge — the same two-phase shape as
  * native aggregates, no driver-side state. */
object Aggregators {

  final case class GeoMeanBuf(sumLog: Double, n: Long)

  /** Geometric mean via sum-of-logs (commutative + associative merge,
    * so map-side combine applies). Non-positive inputs are skipped,
    * matching the defined domain. */
  object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
    override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
    override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf =
      if (x > 0) GeoMeanBuf(b.sumLog + math.log(x), b.n + 1) else b
    override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf =
      GeoMeanBuf(a.sumLog + b.sumLog, a.n + b.n)
    override def finish(b: GeoMeanBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
    override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  final case class PricedLine(price: Double, okey: Long, lnum: Int)

  /** Bounded top-k by (price DESC, okey ASC, lnum ASC). The buffer
    * never exceeds k rows, so map-side partial aggregation reduces each
    * input partition to a k-row state BEFORE the shuffle — grouped
    * top-k without moving the fact table (vs a window, which shuffles
    * every row to its group's partition first). */
  final class TopKLines(k: Int)
      extends Aggregator[PricedLine, Seq[PricedLine], Seq[PricedLine]] {
    private def ord: Ordering[PricedLine] =
      Ordering.by(l => (-l.price, l.okey, l.lnum))
    private def top(s: Seq[PricedLine]): Seq[PricedLine] =
      s.sorted(ord).take(k)
    override def zero: Seq[PricedLine] = Nil
    override def reduce(b: Seq[PricedLine], x: PricedLine): Seq[PricedLine] =
      top(b :+ x)
    override def merge(a: Seq[PricedLine], b: Seq[PricedLine]): Seq[PricedLine] =
      top(a ++ b)
    override def finish(b: Seq[PricedLine]): Seq[PricedLine] = b
    override def bufferEncoder: Encoder[Seq[PricedLine]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[PricedLine]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
