package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source adapters for the reference's API-shaped payloads (SURVEY
  * §2.1 S1–S4, S6). Network fetching is the caller's concern (the
  * engine is a library; rate limits like the reference's 18 s sleeps,
  * `weekly_dag.py:381`, belong to the ingestion scheduler) — these
  * adapters turn already-fetched JSON payload strings into typed
  * DataFrames, distributed via `spark.read.json` over a
  * Dataset[String].
  */
object Ingest {

  /** S1 — scalar-field spot payload (`daily_dag.py:48-60`: gold/oil
    * spot JSON like `{"data": {"price": ...}}` / `{"rates": {"SGD":
    * ...}}`): nested field access, one row per payload. The schema is
    * built from the field path (numeric leaf by the spot contract) so
    * the reader never runs a schema-inference pass over the payload
    * set — at scale that pass is a full extra read. */
  def spotPrices(spark: SparkSession, payloads: Dataset[String],
                 fieldPath: String, asName: String): DataFrame = {
    val leaf: DataType = DoubleType
    val schema = fieldPath.split('.').foldRight(leaf) { (name, inner) =>
      StructType(Seq(StructField(name, inner)))
    }.asInstanceOf[StructType]
    spark.read.schema(schema).json(payloads).select(col(fieldPath).as(asName))
  }

  /** S4 — macro-series payload (`weekly_dag.py:367-391`: Alpha-Vantage
    * shape `{"name": ..., "data": [{"date": ..., "value": ...}]}`) →
    * tall (date, value_<NAME>) frame via explode. The reference builds
    * this with a Python loop per element; here it is one distributed
    * explode + projection. Explicit schema: no inference pass, and
    * `value` reads as string (the API quotes its numbers; a raw JSON
    * number token round-trips through the string column losslessly)
    * before the cast to double. */
  val macroSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("data", ArrayType(StructType(Seq(
      StructField("date", StringType),
      StructField("value", StringType)))))))

  def macroSeries(spark: SparkSession, payloads: Dataset[String],
                  indicator: String): DataFrame =
    spark.read.schema(macroSchema).json(payloads)
      .select(explode(col("data")).as("d"))
      .select(to_date(col("d.date")).as("date"),
        col("d.value").cast("double").as(s"value_$indicator"))

  /** S3 — scraped key-value table (`weekly_dag.py:56-71`: long
    * (attribute, value) rows per ticker) → typed long frame, ready for
    * the R1 pivot (Relational.pivotKV). */
  val kvSchema: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("metric", StringType),
    StructField("value", StringType)))

  def keyValueScrape(spark: SparkSession, payloads: Dataset[String]): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("ticker", StringType),
        StructField("rows", ArrayType(StructType(Seq(
          StructField("metric", StringType),
          StructField("value", StringType))))))))
      .json(payloads)
      .select(col("ticker"), explode(col("rows")).as("kv"))
      .select(col("ticker"), col("kv.metric").as("metric"),
        col("kv.value").as("value"))

  /** S2 — per-entity history frames tagged with their entity id
    * (`daily_dag.py:91-96`: per-ticker OHLCV histories unioned):
    * tag each frame with a literal and union by name. */
  def taggedUnion(frames: Seq[(String, DataFrame)],
                  tagCol: String): DataFrame =
    frames.map { case (tag, df) => df.withColumn(tagCol, lit(tag)) }
      .reduce(_.unionByName(_))

  /** Quarantining JSON ingest: parse payloads against an EXPLICIT
    * schema in PERMISSIVE mode and split the result into
    * `(good, quarantine)` — rows whose payload failed to parse keep
    * their raw text in the quarantine frame's `raw` column. The
    * 100 TB ingestion contract in one adapter: a malformed payload is
    * a ROW to inspect, never a failed task (FAILFAST) or a silent
    * all-null row mixed into the good data (plain PERMISSIVE). Both
    * frames come from ONE parse of the input. */
  def jsonWithQuarantine(spark: SparkSession, payloads: Dataset[String],
                         schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not declare _corrupt_record — the adapter adds it")
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType))
    val parsed = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(payloads)
      // Spark requires caching (or a materialization boundary) before
      // filtering on the corrupt-record column alone
      .cache()
    val good = parsed.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (good, quarantine)
  }

  /** Quarantining CSV ingest — the delimited-text face of the same
    * contract as [[jsonWithQuarantine]]: explicit schema, PERMISSIVE
    * parse, one pass feeding both the typed frame and the raw-line
    * quarantine. CSV is the other format a 100 TB crawl actually
    * arrives in; schema inference on it is a full extra pass AND a
    * correctness hazard (a numeric column with one stray header line
    * infers string), so the schema parameter is not optional. */
  def csvWithQuarantine(spark: SparkSession, path: String,
                        schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not declare _corrupt_record — the adapter adds it")
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType))
    val parsed = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", "false")
      .csv(path)
      .cache()
    val good = parsed.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (good, quarantine)
  }
}
