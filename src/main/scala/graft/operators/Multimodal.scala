package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star ★): media as opaque BINARY
  * columns with typed metadata, decoded/feature-extracted per
  * partition. The decode kernel itself is STUBBED (this container has
  * no image/audio codecs — see `fakeDecode`); everything around it —
  * schema, batching, partitioning, output contract — is real and
  * tested (MultimodalSpec).
  *
  * Scale design: decode runs inside `mapPartitions`, so each executor
  * core streams its partition through the (native) codec without
  * per-row JVM↔native round trips; partition sizing is controlled
  * upstream by `spark.sql.files.maxPartitionBytes`, and decoded
  * features (small) rather than raw media (large) flow into any
  * downstream shuffle.
  */
object Multimodal {

  /** Schema of a decoded media feature row. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fingerprint", StringType, nullable = false)))

  /** Deterministic stand-in for a real codec: derives stable pseudo
    * dimensions and a fingerprint from the raw bytes. A production
    * build replaces ONLY this function (e.g. with a JNI image
    * decoder); the operator contract is unchanged. */
  def fakeDecode(docId: Long, media: Array[Byte]): Row = {
    val len = media.length.toLong
    val width = (len % 640).toInt
    val height = ((len * 7) % 480).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(media).map("%02x".format(_)).mkString.take(16)
    Row(docId, len, width, height, fp)
  }

  /** Media table → feature table via per-partition decode. Input needs
    * (idCol: long, mediaCol: binary). */
  def decodeFeatures(media: DataFrame, idCol: String,
                     mediaCol: String): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col(idCol).cast("long"), col(mediaCol))
      .rdd.mapPartitions(_.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1))))
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Synthesizes a media table from the documents corpus (text bytes
    * as the opaque payload) — the test stand-in for a parquet of real
    * image/audio bytes. */
  def syntheticMediaTable(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(lit("text/plain").as("mime"), col("lang").as("lang"),
        col("n_chars").as("n_chars")).as("meta"))

  /** Frame sampling over an opaque binary payload (the video-style
    * operator of the north star): a `frameSize`-byte window every
    * `stride` bytes, exploded to (id, frame_idx, frame) rows — all
    * byte slicing happens in Column expressions on the BINARY column,
    * so the scan never decodes whole payloads and the explode output
    * is the only thing that grows. Payloads shorter than one frame
    * yield no rows. */
  def frameSample(media: DataFrame, idCol: String, mediaCol: String,
                  frameSize: Int, stride: Int): DataFrame = {
    val len = length(col(mediaCol))
    val nFrames = floor((len - frameSize).cast("double") / stride).cast("long")
    media
      .filter(len >= frameSize)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0L), nFrames),
          i => col(mediaCol).substr(
            (i * stride + 1).cast("int"), lit(frameSize)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
  }
}
