package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {

  test("salted join equals the plain join on a skewed key") {
    // lineitem⋈supplier: 10 suppliers over 6k rows — every key is
    // "hot" relative to the small side, the salting worst case.
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey").as("s_suppkey"), col("l_orderkey"),
        col("l_extendedprice"))
    val sup = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    val plain = li.join(sup, Seq("s_suppkey"))
    val salted = Skew.saltedJoin(li, sup, Seq("s_suppkey"), saltBuckets = 8)
    assertBagEqual(salted.select(plain.columns.map(col): _*), plain)
  }
}
