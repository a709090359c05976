package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the custom Catalyst expressions, so
  * `spark.sql("SELECT minhash_bands(...), dot_product(...)")` works.
  *
  * Two entry points:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection path)
  *  - per-session: `GraftExtensions.register(spark)` for sessions built
  *    without the conf (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // Post-hoc (after the main optimizer batches, so projections have
    // collapsed): window-top-1 → partial-aggregating min_by/max_by.
    ext.injectOptimizerRule(_ => graft.plans.TopOnePerKey)
  }
}

object GraftExtensions {

  private[functions] val definitions
      : Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("minhash_bands",
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => MinHashBands(args.head)),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("char_trigrams",
      new ExpressionInfo(classOf[CharNgrams].getName, "char_trigrams"),
      (args: Seq[Expression]) => CharNgrams(args.head, 3, dedup = true)),
    ("char_ngrams",
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (args: Seq[Expression]) =>
        CharNgrams(args(0), intLit(args(1), "char_ngrams"), dedup = false)),
    ("rolling_fingerprint",
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (args: Seq[Expression]) =>
        RollingFingerprint(args(0), intLit(args(1), "rolling_fingerprint"))),
    ("simhash",
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (args: Seq[Expression]) => SimHash(args(0), intLit(args(1), "simhash"))))

  private def intLit(e: Expression, fn: String): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal argument, got $other")
  }

  /** Idempotent per-session registration (temp functions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    definitions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, info, builder)
    }
}
