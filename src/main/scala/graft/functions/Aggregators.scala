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
}
