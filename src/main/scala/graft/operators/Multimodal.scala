package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star ★): media as opaque BINARY
  * columns with typed metadata, decoded/feature-extracted per
  * partition. The metadata tier is REAL — `imageHeaderFeatures` parses
  * actual PNG/GIF/BMP/JPEG container bytes via the codegen'd
  * `plans.ImageMeta` expression (q87 oracle + ImageHeaderSpec). Only
  * the PIXEL-level kernel is stubbed (this container has no codecs —
  * see `fakeDecode`); everything around it — schema, batching,
  * partitioning, output contract — is real and tested (MultimodalSpec).
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

  /** Synthesizes REAL image-container bytes (PNG / GIF / JPEG headers
    * with document-derived dimensions) in pure Column arithmetic —
    * `format_string` renders field hex, `unhex` packs it. The payload
    * bodies are header-only; that is exactly the point: the metadata
    * tier below never reads past the header anyway. */
  def synthImageTable(documents: DataFrame): DataFrame = {
    val w = (col("n_chars") % 640 + 1).cast("int")
    val h = (col("doc_id") % 480 + 1).cast("int")
    val be32 = (v: org.apache.spark.sql.Column) => format_string("%08x", v)
    val be16 = (v: org.apache.spark.sql.Column) => format_string("%04x", v)
    val le16 = (v: org.apache.spark.sql.Column) =>
      format_string("%02x%02x", v % 256, (v / 256).cast("int"))
    val png = concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      be32(w), be32(h), lit("0806000000"))
    val gif = concat(lit("474946383961"), le16(w), le16(h), lit("00"))
    val jpeg = concat(
      lit("FFD8" + "FFE000104A46494600010100000100010000" + "FFC00011" + "08"),
      be16(h), be16(w), lit("03011100021101031101"))
    documents.select(col("doc_id"),
      unhex(when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, gif)
        .otherwise(jpeg)).as("media"))
  }

  /** Synthetic AUDIO container table: REAL WAV (even doc_id) and FLAC
    * (odd) headers assembled byte-for-byte from document columns, so
    * the audio header parser runs against genuine container layouts
    * and the oracle can recompute the fields from the same formulas.
    * Header-only payloads — the parse never needs sample data. */
  def synthAudioTable(documents: DataFrame): DataFrame = {
    val ch = (col("doc_id") % 2 + 1).cast("int")
    val rate = (lit(8000) + (col("n_chars") % 5) * 8000).cast("int")
    val bits = lit(16)
    val nSamples = (col("n_chars") * 100 + 7).cast("long")
    val align = ch * (bits / 8)
    val dataSize = nSamples * align
    val le16 = (v: org.apache.spark.sql.Column) =>
      format_string("%02x%02x", (v % 256).cast("int"), (v / 256 % 256).cast("int"))
    val le32 = (v: org.apache.spark.sql.Column) =>
      format_string("%02x%02x%02x%02x", (v % 256).cast("int"),
        (v / 256 % 256).cast("int"), (v / 65536 % 256).cast("int"),
        (v / 16777216 % 256).cast("int"))
    val wav = concat(lit("52494646"), le32(dataSize + 36), lit("57415645"),
      lit("666D7420"), le32(lit(16)), le16(lit(1)), le16(ch), le32(rate),
      le32(rate * align), le16(align), le16(bits),
      lit("64617461"), le32(dataSize))
    // fLaC + STREAMINFO block header (last=0, type=0, len=34), block
    // sizes 4096/4096, frame sizes 0, then the packed 64-bit field
    val packed = rate.cast("long") * lit(17592186044416L) + // << 44
      (ch - 1).cast("long") * lit(2199023255552L) +         // << 41
      (bits - 1).cast("long") * lit(68719476736L) +         // << 36
      nSamples
    val flac = concat(lit("664C6143" + "00000022" + "10001000" +
      "000000" + "000000"), format_string("%016x", packed),
      lit("0" * 32)) // 16-byte MD5 of the (absent) samples
    documents.select(col("doc_id"),
      unhex(when(col("doc_id") % 2 === 0, wav).otherwise(flac)).as("media"))
  }

  /** Audio header-tier decode (REAL — see `plans.AudioHeaders`):
    * `(format, channels, sample_rate, bits_per_sample, n_samples)`
    * from leading container bytes as a codegen'd scalar expression. */
  def audioHeaderFeatures(media: DataFrame, idCol: String,
                          mediaCol: String): DataFrame =
    media
      .select(col(idCol), graft.plans.AudioMeta(col(mediaCol)).as("a"))
      .select(col(idCol), col("a.format").as("format"),
        col("a.channels").as("channels"),
        col("a.sample_rate").as("sample_rate"),
        col("a.bits_per_sample").as("bits_per_sample"),
        col("a.n_samples").as("n_samples"))

  /** Synthetic MP4 containers assembled BYTE-FOR-BYTE from document
    * columns (the q103 pattern for video): a real ftyp box (brand
    * varies), a moov whose mvhd alternates version 0 and version 1
    * layouts (32- vs 64-bit duration), and 1–3 trak boxes each
    * carrying a tkhd with 16.16 fixed-point dimensions. The parser
    * must walk sizes exactly — any offset bug breaks the oracle. */
  def synthVideoTable(documents: DataFrame): DataFrame = {
    val be32 = (v: org.apache.spark.sql.Column) =>
      format_string("%08x", v.cast("int"))
    val timescale = (lit(600) * (lit(1) + col("n_chars") % 5)).cast("int")
    val duration = (col("n_chars") * 1234 + 5).cast("long")
    val nTracks = (lit(1) + col("doc_id") % 3).cast("int")
    val width = (lit(320) * (lit(1) + col("doc_id") % 4)).cast("int")
    val height = (lit(240) * (lit(1) + col("doc_id") % 4)).cast("int")
    val brandHex = when(col("doc_id") % 2 === 0, lit("69736f6d")) // isom
      .otherwise(lit("6d703432")) // mp42
    val ftyp = concat(lit("00000014" + "66747970"), brandHex,
      lit("00000200" + "69736f6d"))
    val matrix = "00010000" + "00000000" * 3 + "00010000" +
      "00000000" * 3 + "40000000"
    // rate, volume, 10 reserved bytes, matrix, 24 predefined, next id
    val mvhdTail = "00010000" + "0100" + "00" * 10 + matrix +
      "00" * 24 + "00000003"
    val mvhdV0 = concat(lit("0000006c" + "6d766864" + "00000000" +
      "00000000" + "00000000"), be32(timescale), be32(duration),
      lit(mvhdTail))
    val mvhdV1 = concat(lit("00000078" + "6d766864" + "01000000" +
      "00" * 16 + ""), be32(timescale), format_string("%016x", duration),
      lit(mvhdTail))
    val mvhd = when(col("doc_id") % 2 === 0, mvhdV0).otherwise(mvhdV1)
    val mvhdSize = when(col("doc_id") % 2 === 0, lit(108)).otherwise(lit(120))
    val tkhd = concat(lit("0000005c" + "746b6864" + "00000007" +
      "00000000" + "00000000" + "00000001" + "00000000" + "00000000" +
      "00" * 8 + "0000" + "0000" + "0000" + "0000" + matrix),
      format_string("%04x0000", width), format_string("%04x0000", height))
    val trak = concat(lit("00000064" + "7472616b"), tkhd)
    val traks = when(nTracks === 1, trak)
      .when(nTracks === 2, concat(trak, trak))
      .otherwise(concat(trak, trak, trak))
    val moov = concat(be32(lit(8) + mvhdSize + nTracks * 100),
      lit("6d6f6f76"), mvhd, traks)
    documents.select(col("doc_id"), unhex(concat(ftyp, moov)).as("media"))
  }

  /** Video header-tier decode (REAL — see `plans.VideoHeaders`):
    * `(format, brand, timescale, duration, n_tracks, width, height)`
    * from leading MP4 container bytes as a codegen'd scalar
    * expression. */
  def videoHeaderFeatures(media: DataFrame, idCol: String,
                          mediaCol: String): DataFrame =
    media
      .select(col(idCol), graft.plans.VideoMeta(col(mediaCol)).as("v"))
      .select(col(idCol), col("v.format").as("format"),
        col("v.brand").as("brand"), col("v.timescale").as("timescale"),
        col("v.duration").as("duration"), col("v.n_tracks").as("n_tracks"),
        col("v.width").as("width"), col("v.height").as("height"))

  /** Header-tier decode (the REAL one — see `plans.ImageHeaders`):
    * `(format, width, height)` from leading container bytes, as a
    * codegen'd scalar expression. Unrecognized payloads come back
    * null-metadata, kept for the caller to quarantine. */
  def imageHeaderFeatures(media: DataFrame, idCol: String,
                          mediaCol: String): DataFrame =
    media
      .select(col(idCol), graft.plans.ImageMeta(col(mediaCol)).as("img"))
      .select(col(idCol), col("img.format").as("format"),
        col("img.width").as("width"), col("img.height").as("height"))

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
