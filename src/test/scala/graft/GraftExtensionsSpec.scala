package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("kernels are callable from pure SQL after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
             size(shingle_hashes('a b c d', 3)) AS nsh,
             size(minhash_sig(shingle_hashes('a b c d', 3), 16)) AS k,
             simhash64(shingle_hashes('a b c d', 3), 32) AS sh,
             sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS ic
    """).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)   // "a b c", "b c d"
    assert(r.getInt(2) == 16)
    assert(r.getLong(3) != 0L)
    assert(r.getInt(4) == 2)
  }

  test("SQL path equals the Column API path on real docs") {
    GraftExtensions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(shingle_hashes(text, 3), 32) AS s FROM docs_ext")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions.col
    val viaApi = docs.select(col("doc_id"),
      graft.operators.Dedup.simhashFromHashes(
        graft.operators.Dedup.shingleHashes(col("text"), 3), 32).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }

  test("arity errors are reported at analysis time") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("2 arguments"))
  }
}
