package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL registration for the graft custom expressions — after
  * `GraftFunctions.registerAll(spark)`, `simhash64(array<string>)` and
  * `dot_product(array<double|float>, array<double|float>)` are callable from
  * `spark.sql` alongside the built-ins. [[GraftExtensions]] is the
  * no-code deployment path over the same table.
  */
object GraftFunctions {
  /** The single source of truth: SQL name → expression builder. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (exprs => SimHash64Expr(exprs.head)),
    "dot_product" -> (exprs => DotProductExpr(exprs(0), exprs(1))),
    "minhash_sigs" -> (exprs => MinHashSigsExpr(exprs.head, 8)),
    "sorted_intersect_count" -> (exprs => SortedIntersectCountExpr(exprs(0), exprs(1))),
    "shingle_sorted_set" -> (exprs => ShingleSortedSetExpr(exprs.head, 2)),
    "md5_simhash60" -> (exprs => Md5SimHash60Expr(exprs.head)),
    "lsh_bucket" -> (exprs => LshBucketExpr(exprs.head,
      exprs.lift(1).map(litInt).getOrElse(4),
      exprs.lift(2).map(litInt).getOrElse(0))))

  /** Foldable-int argument for SQL-callable kernels with plan-time
    * parameters (`lsh_bucket(v, planes, offset)`).
    */
  private def litInt(e: Expression): Int = e.eval(null) match {
    case n: Number => n.intValue
    case other => throw new IllegalArgumentException(
      s"expected a foldable integer argument, got $other")
  }

  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}

/** Cluster-wide registration without driver code: launch with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` and
  * every session built in the application (including Thrift / Connect
  * sessions) resolves the graft functions like built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}
