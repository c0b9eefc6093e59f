package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL registration for the graft custom expressions — after
  * `GraftFunctions.registerAll(spark)`, `simhash64(array<string>)` and
  * `dot_product(array<double>, array<double>)` are callable from
  * `spark.sql` alongside the built-ins.
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "simhash64",
      exprs => SimHash64Expr(exprs.head))
    ColumnBridge.registerFunction(spark, "dot_product",
      exprs => DotProductExpr(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "minhash_sigs",
      exprs => MinHashSigsExpr(exprs.head, 8))
    ColumnBridge.registerFunction(spark, "sorted_intersect_count",
      exprs => SortedIntersectCountExpr(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "shingle_sorted_set",
      exprs => ShingleSortedSetExpr(exprs.head, 2))
    ColumnBridge.registerFunction(spark, "md5_simhash60",
      exprs => Md5SimHash60Expr(exprs.head))
  }
}
