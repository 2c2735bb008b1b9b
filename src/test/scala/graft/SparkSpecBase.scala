package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite (lazy — one JVM-wide session is reused
  * across suites via getOrCreate). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // managed (bucketed) tables land under /tmp, not the repo
    .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf: String = "/root/testdata/sf0.001"

  /** Bag equality via symmetric exceptAll (SURVEY A2). */
  def assertBagEqual(a: org.apache.spark.sql.DataFrame,
                     b: org.apache.spark.sql.DataFrame): Unit = {
    val aNotB = a.exceptAll(b).count()
    val bNotA = b.exceptAll(a).count()
    assert(aNotB == 0 && bNotA == 0,
      s"bag mismatch: $aNotB rows only in left, $bNotA only in right")
  }
}
