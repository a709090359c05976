package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Element-wise vector-sum aggregation (`Aggregator`/`udaf`, SURVEY
  * §2.11) — the mergeable building block for distributed centroid
  * computation (the k-means update step) over `array<double>` embedding
  * columns.
  *
  * The built-in alternative — posexplode to (key, dim, x) rows and
  * groupBy (key, dim) — multiplies shuffle rows by the dimensionality
  * (64× on the fixture embeddings). This buffer instead ships ONE
  * dim-length array per key per map partition: classic partial
  * aggregation, so at 100 TB the shuffle carries `keys × dim` doubles
  * regardless of corpus size. The buffer is mutated in place per
  * partition (no per-row allocation).
  */
object VectorAgg {

  val vectorSum: Aggregator[Seq[Double], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Array[Double], Seq[Double]] {
      override def zero: Array[Double] = Array.emptyDoubleArray

      private def add(b: Array[Double], a: Seq[Double]): Array[Double] =
        if (b.isEmpty) a.toArray
        else {
          require(b.length == a.length,
            s"vector dim mismatch: ${b.length} vs ${a.length}")
          var i = 0
          while (i < b.length) { b(i) += a(i); i += 1 }
          b
        }

      override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] =
        if (a == null) b else add(b, a)
      override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
        if (b1.isEmpty) b2 else if (b2.isEmpty) b1 else add(b1, b2.toSeq)
      override def finish(r: Array[Double]): Seq[Double] = r.toSeq
      override def bufferEncoder = ExpressionEncoder[Array[Double]]()
      override def outputEncoder = ExpressionEncoder[Seq[Double]]()
    }

  /** Element-wise max-|x| aggregation — the scale model for int8
    * scalar quantization (SQ8). Same dim-length-buffer shape as
    * [[vectorSum]]; unlike a sum, max is ORDER-INDEPENDENT, so the
    * result is bit-identical on any engine regardless of partitioning
    * or merge order (no rounding resynchronization needed). */
  val vectorMaxAbs: Aggregator[Seq[Double], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Array[Double], Seq[Double]] {
      override def zero: Array[Double] = Array.emptyDoubleArray

      private def add(b: Array[Double], a: Seq[Double]): Array[Double] =
        if (b.isEmpty) a.map(math.abs).toArray
        else {
          require(b.length == a.length,
            s"vector dim mismatch: ${b.length} vs ${a.length}")
          var i = 0
          while (i < b.length) {
            val x = math.abs(a(i)); if (x > b(i)) b(i) = x; i += 1
          }
          b
        }

      override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] =
        if (a == null) b else add(b, a)
      override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
        if (b1.isEmpty) b2 else if (b2.isEmpty) b1 else add(b1, b2.toSeq)
      override def finish(r: Array[Double]): Seq[Double] = r.toSeq
      override def bufferEncoder = ExpressionEncoder[Array[Double]]()
      override def outputEncoder = ExpressionEncoder[Seq[Double]]()
    }
}
