package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  test("mapPartitions decode path agrees with the Column-expression path") {
    val media = Multimodal.syntheticMediaTable(Tables.documents(spark, sf))
    val decoded = Multimodal.decodeFeatures(media, "doc_id", "media")
    val expected = media.select(col("doc_id"), col("media"),
        length(col("media")).cast("long").as("byte_len"))
      .withColumn("width", (col("byte_len") % 640).cast("int"))
      .withColumn("height", ((col("byte_len") * 7) % 480).cast("int"))
      .withColumn("fingerprint", substring(lower(md5(col("media"))), 1, 16))
      .drop("media")
    assertBagEqual(decoded.select("doc_id", "byte_len", "width", "height",
      "fingerprint"), expected)
  }

  test("frameSample windows the payload with stride and drops short payloads") {
    import spark.implicits._
    val media = Seq(
      (1L, ("a" * 300).getBytes("UTF-8")),  // frames at 0,128: idx 0,1
      (2L, ("b" * 10).getBytes("UTF-8")))   // shorter than a frame → none
      .toDF("doc_id", "media")
    val frames = graft.operators.Multimodal
      .frameSample(media, "doc_id", "media", frameSize = 64, stride = 128)
      .collect()
    assert(frames.forall(_.getLong(0) == 1L))
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 1))
    assert(frames.forall(_.getAs[Array[Byte]](2).length == 64))
  }

  test("media table schema carries typed metadata") {
    val media = Multimodal.syntheticMediaTable(Tables.documents(spark, sf))
    assert(media.schema("media").dataType.typeName == "binary")
    assert(media.select(col("meta.mime")).distinct().head.getString(0)
      == "text/plain")
  }
}
