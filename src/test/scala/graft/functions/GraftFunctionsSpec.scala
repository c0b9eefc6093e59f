package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.registerAll(spark)
    val h = spark.sql("SELECT simhash64(split('the quick brown fox', ' ')) AS h")
      .as[Long].head()
    val viaCol = Seq("the quick brown fox").toDF("t")
      .select(SimHash64Expr.simhash64(org.apache.spark.sql.functions.split($"t", " ")))
      .as[Long].head()
    assert(h == viaCol)

    val d = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").as[Double].head()
    assert(d == 11.0)
  }

  test("dedup kernels are SQL-callable end-to-end") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT sorted_intersect_count(shingle_sorted_set('a b c'),
        |                              shingle_sorted_set('a b d')) AS c,
        |       minhash_sigs(shingle_sorted_set('a b c')) AS sig""".stripMargin).head()
    assert(r.getLong(0) == 1L) // shared bigram: "a b"
    assert(r.getSeq[Long](1).length == 8)
  }

  test("lsh_bucket is SQL-callable with plan-time planes/offset arguments") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT lsh_bucket(CAST(array(0.5, 0.5, 0.5, 0.5) AS ARRAY<FLOAT>)) AS b4,
        |       lsh_bucket(CAST(array(0.5, 0.5, 0.5, 0.5) AS ARRAY<FLOAT>), 6, 3) AS b63""".stripMargin).head()
    assert(r.getLong(0) >= 0 && r.getLong(0) < 16)
    assert(r.getLong(1) >= 0 && r.getLong(1) < 64)
  }

  test("custom expressions reject wrong input types at analysis time") {
    GraftFunctions.registerAll(spark)
    val bad = Seq(
      "SELECT dot_product(array('a'), array('b'))",
      "SELECT simhash64(42)",
      "SELECT minhash_sigs(array(1, 2))",
      "SELECT sorted_intersect_count(array(1), array(2))",
      "SELECT shingle_sorted_set(array('x'))")
    bad.foreach { sql =>
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql).collect())
      assert(e.getMessage.contains("requires"), s"$sql: ${e.getMessage.take(120)}")
    }
  }

  test("GraftExtensions injects every kernel; injected builders evaluate correctly") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    org.apache.spark.sql.graftbridge.ColumnBridge.applyExtensions(ext, reg)
    GraftFunctions.all.foreach { case (name, _) =>
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)), name)
    }
    // an injected builder produces the same expression the session path does
    val viaExt = reg.lookupFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(Array("a", "b"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(Array("b", "c"),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))))
    assert(viaExt.eval(null) == 1L)
  }

  test("dot_product widens float inputs exactly: every type pair matches the cast form") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """WITH v AS (SELECT CAST(array(1.5, -2.25, 3.75) AS ARRAY<FLOAT>) AS f,
        |                  array(0.5D, 4.0D, -1.25D) AS d)
        |SELECT dot_product(f, f) AS ff, dot_product(f, d) AS fd, dot_product(d, f) AS df,
        |       dot_product(CAST(f AS ARRAY<DOUBLE>), CAST(f AS ARRAY<DOUBLE>)) AS ff0,
        |       dot_product(CAST(f AS ARRAY<DOUBLE>), d) AS fd0
        |FROM v""".stripMargin).head()
    assert(row.getDouble(0) == row.getDouble(3)) // FF == cast-first DD
    assert(row.getDouble(1) == row.getDouble(4)) // FD == cast-first DD
    assert(row.getDouble(1) == row.getDouble(2)) // FD == DF (exact commutation)
  }

  test("dot_product reads integral-element arrays natively, matching the cast form") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """WITH v AS (SELECT array(100L, -50L, 25L) AS l, array(2, -3, 4) AS i,
        |                  array(0.5D, 4.0D, -1.25D) AS d)
        |SELECT dot_product(l, l) AS ll, dot_product(l, d) AS ld, dot_product(i, d) AS id,
        |       dot_product(CAST(l AS ARRAY<DOUBLE>), CAST(l AS ARRAY<DOUBLE>)) AS ll0,
        |       dot_product(CAST(l AS ARRAY<DOUBLE>), d) AS ld0,
        |       dot_product(CAST(i AS ARRAY<DOUBLE>), d) AS id0
        |FROM v""".stripMargin).head()
    assert(row.getDouble(0) == row.getDouble(3)) // LL == cast-first DD
    assert(row.getDouble(1) == row.getDouble(4)) // LD == cast-first DD
    assert(row.getDouble(2) == row.getDouble(5)) // ID == cast-first DD
  }

  test("dot_product matches aggregate(zip_with(...)) on null slots and ragged lengths") {
    GraftFunctions.registerAll(spark)
    val cases = Seq(
      "array(1.0D, 2.0D), array(3.0D, 4.0D)",          // plain
      "array(1.0D, NULL), array(3.0D, 4.0D)",          // null slot left
      "array(1.0D, 2.0D), array(NULL, 4.0D)",          // null slot right
      "array(1.0D, 2.0D, 5.0D), array(3.0D, 4.0D)",    // ragged (zip_with pads null)
      "CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)", // empty
      "CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)")      // null array
    cases.foreach { c =>
      val row = spark.sql(
        s"""SELECT dot_product($c) AS a,
           |aggregate(zip_with($c, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS b"""
          .stripMargin.replaceAll("\n", " ")).head()
      assert(row.isNullAt(0) == row.isNullAt(1), s"null-ness mismatch for ($c): $row")
      if (!row.isNullAt(0)) assert(row.getDouble(0) == row.getDouble(1), s"value mismatch for ($c)")
    }
  }
}
