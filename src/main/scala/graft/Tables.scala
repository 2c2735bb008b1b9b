package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Catalog of the test-warehouse tables (TESTDATA.md / FIXTURES.md).
  *
  * The reference declares every warehouse table with a fixed, explicit
  * schema (`daily_dag.py:121-151`, `weekly_dag.py:500-608`); here that
  * contract is a `StructType` constant per table plus a loader. Loaders
  * read straight parquet — predicate pushdown, column pruning and
  * partition pruning are Catalyst's job, not the caller's.
  */
object Tables {

  /** Path of a table's parquet under a scale-factor directory. */
  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def region(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "region"))
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "nation"))
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "customer"))
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "supplier"))
  def part(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "part"))
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "orders"))
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "lineitem"))
  /** The events table's `ts` column has shipped as both nanosecond
    * parquet timestamps (which Spark's vectorized reader rejects — read
    * as raw nanos and truncate to micros, exactly DuckDB's
    * TIMESTAMP_NS→TIMESTAMP coercion) and plain micros (read natively,
    * as TIMESTAMP_NTZ under Spark's NTZ inference). Normalize either to
    * session-zoned TimestampType; with the UTC session both paths land
    * on identical micros-since-epoch, so oracle comparisons agree. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(path(sfDir, "events")))
  }

  /** Normalize an events frame's `ts` to TimestampType regardless of the
    * on-disk flavor (nanos-as-long, TIMESTAMP_NTZ, or already zoned). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "documents"))
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(path(sfDir, "embeddings"))

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every warehouse table as a temp view so the engine's SQL
    * surface (`spark.sql`) works alongside the Column DSL — the
    * reference's only query language was SQL text shipped to BigQuery
    * (S5/K3 sites); here the same statements run on Spark's parser
    * against the same tables. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir)
      else spark.read.parquet(path(sfDir, n))
      df.createOrReplaceTempView(n)
    }

  /** Declared warehouse schemas, mirroring the reference's DDL blocks
    * (`daily_dag.py:121-151`, `weekly_dag.py:507-608`) re-keyed onto the
    * engine's domain. Used by the sink layer (Sinks.scala) for
    * cast-to-declared-schema semantics (SURVEY §1.4, P3).
    */
  val macroDailySchema: StructType = StructType(Seq(
    StructField("year", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("oil_price", DoubleType),
    StructField("gold_price", DoubleType)))

  val factSchema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType)))
}
