package graft

import graft.operators.Relational
import graft.sources.Ingest
import org.apache.spark.sql.functions._

/** The reference's ingest shapes (SURVEY §2.1) on hand-built payloads
  * mirroring `daily_dag.py` / `weekly_dag.py` API responses. */
class IngestSpec extends SparkSpecBase {
  import spark.implicits._

  test("S1: spot payload scalar extraction") {
    val gold = Seq("""{"data": {"price": 1923.5}}""").toDS()
    val df = Ingest.spotPrices(spark, gold, "data.price", "gold_price")
    assert(df.head.getDouble(0) == 1923.5)
  }

  test("S4: macro series explode to tall frame") {
    val payload = Seq(
      """{"name": "CPI", "data": [
        {"date": "2024-01-01", "value": "3.1"},
        {"date": "2024-02-01", "value": "3.2"}]}""").toDS()
    val df = Ingest.macroSeries(spark, payload, "CPI")
    assert(df.columns.toSeq == Seq("date", "value_CPI"))
    assert(df.count() == 2)
    assert(df.orderBy("date").collect().map(_.getDouble(1)).toSeq == Seq(3.1, 3.2))
  }

  test("S4+J1+R3: multi-series fold matches the reference's merge shape") {
    // weekly_dag.py:393-394 — reduce(pd.merge(on='date')) over series
    val a = Ingest.macroSeries(spark,
      Seq("""{"data": [{"date":"2024-01-01","value":"1"},{"date":"2024-02-01","value":"2"}]}""").toDS(), "A")
    val b = Ingest.macroSeries(spark,
      Seq("""{"data": [{"date":"2024-01-01","value":"10"},{"date":"2024-03-01","value":"30"}]}""").toDS(), "B")
    val joined = Relational.multiJoin(Seq(a, b), Seq("date"))
    assert(joined.count() == 1) // inner join keeps the intersection
    val r = joined.head
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 10.0)
  }

  test("S3+R1: key-value scrape pivots to a wide row") {
    val payload = Seq(
      """{"ticker": "D05", "rows": [
        {"metric": "PE", "value": "10.5"},
        {"metric": "PB", "value": "1.2"}]}""",
      """{"ticker": "O39", "rows": [
        {"metric": "PE", "value": "9.1"}]}""").toDS()
    val long = Ingest.keyValueScrape(spark, payload)
    val wide = Relational.pivotKV(long, "ticker", "metric", "value",
      Seq("PE", "PB"))
    assert(wide.columns.toSeq == Seq("ticker", "PE", "PB"))
    val d05 = wide.filter($"ticker" === "D05").head
    assert(d05.getString(1) == "10.5" && d05.getString(2) == "1.2")
    assert(wide.filter($"ticker" === "O39").head.isNullAt(2)) // missing → null
    // a payload that VIOLATES the one-value-per-(key, metric)
    // contract must still pivot deterministically (max, not the
    // partition-order-dependent first): any nondeterminism here would
    // make the upsert digest read an identical re-pivot as "changed"
    val dup = Seq(
      """{"ticker": "D05", "rows": [
        {"metric": "PE", "value": "10.5"},
        {"metric": "PE", "value": "9.9"}]}""").toDS()
    val dupWide = Relational.pivotKV(
      Ingest.keyValueScrape(spark, dup).repartition(8),
      "ticker", "metric", "value", Seq("PE"))
    assert(dupWide.head.getString(1) == "9.9") // max over strings, stable
  }

  test("S2: tagged per-entity union") {
    val f1 = Seq((1.0, 2.0)).toDF("open", "close")
    val f2 = Seq((3.0, 4.0)).toDF("open", "close")
    val all = Ingest.taggedUnion(Seq("D05" -> f1, "O39" -> f2), "ticker")
    assert(all.count() == 2)
    assert(all.select("ticker").distinct().count() == 2)
  }

  test("quarantining ingest: malformed payloads become rows, not failures") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    val payloads = Seq(
      """{"id": 1, "v": 1.5}""",
      """{"id": 2, "v": """,            // truncated JSON
      """not json at all""",
      """{"id": 3, "v": 2.5}""").toDS()
    val (good, quarantine) = Ingest.jsonWithQuarantine(spark, payloads, schema)
    assert(good.count() == 2)
    assert(good.columns.toSeq == Seq("id", "v"))
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val raw = quarantine.as[String].collect()
    assert(raw.length == 2 && raw.exists(_.contains("not json")))
    // declared _corrupt_record in the user schema is rejected loudly
    intercept[IllegalArgumentException] {
      Ingest.jsonWithQuarantine(spark, payloads, StructType(Seq(
        StructField("_corrupt_record", StringType))))
    }
  }

  test("csvWithQuarantine: typed rows pass, malformed lines quarantine") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = "/tmp/graft-test-csv-quarantine"
    Seq("1,alpha,2.5,2024-01-05T00:00:00.000Z",
      "2,beta,not_a_number,2024-01-06T00:00:00.000Z", // bad double
      "3,gamma,7.25,2024-01-07T00:00:00.000Z",
      "4,delta,1.0,not-a-date" // bad timestamp
    ).toDF("line").coalesce(1)
      .write.mode("overwrite").text(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType), StructField("ts", TimestampType)))
    val (good, quarantine) = Ingest.csvWithQuarantine(spark, dir, schema)
    assert(good.count() == 2)
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val raw = quarantine.as[String].collect()
    assert(raw.length == 2 && raw.exists(_.contains("not_a_number"))
      && raw.exists(_.contains("not-a-date")))
    intercept[IllegalArgumentException] {
      Ingest.csvWithQuarantine(spark, dir, StructType(Seq(
        StructField("_corrupt_record", StringType))))
    }
  }
}
