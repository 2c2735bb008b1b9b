package graft.queries

import graft.{QuerySpec, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-pipeline queries (north-star ★). q50 keeps to pure
  * Column expressions over the BINARY payload so it carries a DuckDB
  * oracle; the mapPartitions decode path (engine-side only) is
  * verified by MultimodalSpec against the same expectations.
  */
object MultimodalQueries {

  /** q50: binary-column metadata extraction — payload size, grouped
    * per (meta.mime, lang) with pseudo-dimension stats derived from
    * byte length exactly as Multimodal.fakeDecode does. Every
    * operation (octet length, modulo, integer sums) is
    * engine-portable. */
  val q50MediaStats: QuerySpec = QuerySpec(
    "q50_media_stats",
    """WITH media AS (
      |  SELECT doc_id, lang, encode(text) AS payload FROM documents),
      |decoded AS (
      |  SELECT doc_id, lang,
      |    CAST(octet_length(payload) AS BIGINT) AS byte_len,
      |    CAST(octet_length(payload) % 640 AS INTEGER) AS width,
      |    CAST((octet_length(payload) * 7) % 480 AS INTEGER) AS height
      |  FROM media)
      |SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
      |  CAST(MAX(width) AS INTEGER) AS max_width,
      |  CAST(MIN(height) AS INTEGER) AS min_height
      |FROM decoded GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val media = Multimodal.syntheticMediaTable(Tables.documents(s, dir))
    media
      .select(col("doc_id"), col("meta.lang").as("lang"),
        length(col("media")).cast("long").as("byte_len"))
      .withColumn("width", (col("byte_len") % 640).cast("int"))
      .withColumn("height", ((col("byte_len") * 7) % 480).cast("int"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).cast("long").as("total_bytes"),
        max(col("width")).cast("int").as("max_width"),
        min(col("height")).cast("int").as("min_height"))
      .orderBy(col("lang"))
  }

  val specs: Seq[QuerySpec] = Seq(q50MediaStats)
}
