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

  /** q57: frame sampling — 64-byte frames every 128 bytes over the
    * binary payload, fingerprinted per frame. Spark slices the BINARY
    * column; the oracle slices VARCHAR, which is byte-identical
    * because the synthetic payload is ASCII (a real codec payload
    * keeps the Spark side unchanged and drops the oracle, as with the
    * other engine-side-only tiers). */
  val q57FrameSample: QuerySpec = QuerySpec(
    "q57_frame_sample",
    """WITH frames AS (
      |  SELECT doc_id, u.i AS frame_idx,
      |    substring(text, u.i * 128 + 1, 64) AS frame
      |  FROM documents,
      |    unnest(range(0, CAST(floor((length(text) - 64) / 128.0) AS BIGINT) + 1))
      |      AS u(i)
      |  WHERE length(text) >= 64)
      |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |  CAST(length(frame) AS BIGINT) AS frame_len,
      |  substr(md5(frame), 1, 8) AS frame_fp
      |FROM frames ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    val media = Multimodal.syntheticMediaTable(Tables.documents(s, dir))
    Multimodal.frameSample(media, "doc_id", "media", frameSize = 64,
        stride = 128)
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        substring(md5(col("frame")), 1, 8).as("frame_fp"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** q87: image header decode (`plans.ImageHeaders` via
    * `Multimodal.imageHeaderFeatures` — the REAL metadata tier): the
    * corpus synthesizes genuine PNG/GIF/JPEG container bytes with
    * document-derived dimensions, and the engine must parse them BACK
    * out of the raw bytes (fixed-offset reads for PNG/GIF, a marker
    * walk for JPEG). The oracle states the dimension formulas directly
    * — so any endianness, offset, or marker-walk mistake in the parser
    * breaks the hash match. */
  val q87ImageHeaders: QuerySpec = QuerySpec(
    "q87_image_headers",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'gif' ELSE 'jpeg' END AS format,
      |  CAST(n_chars % 640 + 1 AS INTEGER) AS width,
      |  CAST(doc_id % 480 + 1 AS INTEGER) AS height
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Multimodal.imageHeaderFeatures(
        Multimodal.synthImageTable(Tables.documents(s, dir)),
        "doc_id", "media")
      .orderBy(col("doc_id"))
  }

  /** q103: audio header decode (`plans.AudioHeaders` via
    * `Multimodal.audioHeaderFeatures`) — REAL WAV RIFF-chunk-walk and
    * FLAC STREAMINFO bit-unpack over container bytes assembled
    * byte-for-byte from document columns; the oracle recomputes every
    * field from the same synthesis formulas, so a parser bug (wrong
    * offset, endianness, bit boundary) breaks the hash. Duration
    * derives as n_samples/rate — the metadata a 100 TB audio corpus
    * scan actually needs, no codec, no payload inflation. */
  val q103AudioHeaders: QuerySpec = QuerySpec(
    "q103_audio_headers",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS format,
      |  CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
      |  CAST(8000 + (n_chars % 5) * 8000 AS INTEGER) AS sample_rate,
      |  16 AS bits_per_sample,
      |  CAST(n_chars * 100 + 7 AS BIGINT) AS n_samples,
      |  CAST((n_chars * 100 + 7) * 1000 AS BIGINT)
      |    // (8000 + (n_chars % 5) * 8000) AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Multimodal.audioHeaderFeatures(
        Multimodal.synthAudioTable(Tables.documents(s, dir)),
        "doc_id", "media")
      .withColumn("duration_ms",
        expr("(n_samples * 1000) div sample_rate"))
      .orderBy(col("doc_id"))
  }

  /** q129: video header decode (`plans.VideoHeaders` via
    * `Multimodal.videoHeaderFeatures`) — REAL ISO-BMFF box walk over
    * MP4 containers assembled byte-for-byte from document columns:
    * ftyp brand, mvhd version 0 AND version 1 layouts (32/64-bit
    * duration), trak counting, first tkhd's 16.16 dimensions. The
    * oracle recomputes every field from the synthesis formulas, so
    * any offset/endianness/version bug breaks the hash. Completes
    * the image/audio/video header triad. */
  val q129VideoHeaders: QuerySpec = QuerySpec(
    "q129_video_headers",
    """SELECT doc_id, 'mp4' AS format,
      |  CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
      |  CAST(600 * (1 + n_chars % 5) AS INTEGER) AS timescale,
      |  CAST(n_chars * 1234 + 5 AS BIGINT) AS duration,
      |  CAST(1 + doc_id % 3 AS INTEGER) AS n_tracks,
      |  CAST(320 * (1 + doc_id % 4) AS INTEGER) AS width,
      |  CAST(240 * (1 + doc_id % 4) AS INTEGER) AS height,
      |  CAST((n_chars * 1234 + 5) * 1000 AS BIGINT)
      |    // CAST(600 * (1 + n_chars % 5) AS BIGINT) AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Multimodal.videoHeaderFeatures(
        Multimodal.synthVideoTable(Tables.documents(s, dir)),
        "doc_id", "media")
      .withColumn("duration_ms",
        expr("(duration * 1000) div timescale"))
      .orderBy(col("doc_id"))
  }

  /** q135: multimodal curation lifecycle — the q93 composite for
    * media: every document's image + audio + video payloads decode
    * through the three REAL header parsers, per-modality quality
    * gates apply (resolution, sample-rate + duration, height +
    * runtime), and the per-source funnel of survivors aggregates.
    * The oracle recomputes every gate from the synthesis formulas, so
    * a parse bug in ANY of the three parsers (or a broken join)
    * breaks the hash. One plan: three narrow decodes joined on the
    * key, no shuffles until the final metadata-sized aggregate. */
  val q135MediaCuration: QuerySpec = QuerySpec(
    "q135_media_curation",
    """WITH g AS (
      |  SELECT source,
      |    (n_chars % 640 + 1) * (doc_id % 480 + 1) >= 50000 AS img_ok,
      |    8000 + (n_chars % 5) * 8000 >= 16000 AND
      |      (n_chars * 100 + 7) // (8000 + (n_chars % 5) * 8000) >= 5
      |      AS aud_ok,
      |    240 * (1 + doc_id % 4) >= 480 AND
      |      ((n_chars * 1234 + 5) * 1000) // (600 * (1 + n_chars % 5))
      |        >= 60000 AS vid_ok
      |  FROM documents)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN img_ok THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_img_ok,
      |  CAST(SUM(CASE WHEN aud_ok THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_aud_ok,
      |  CAST(SUM(CASE WHEN vid_ok THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_vid_ok,
      |  CAST(SUM(CASE WHEN img_ok AND aud_ok AND vid_ok THEN 1 ELSE 0
      |    END) AS BIGINT) AS n_curated
      |FROM g GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val img = Multimodal.imageHeaderFeatures(
        Multimodal.synthImageTable(docs), "doc_id", "media")
      .select(col("doc_id"),
        (col("width") * col("height") >= 50000).as("img_ok"))
    val aud = Multimodal.audioHeaderFeatures(
        Multimodal.synthAudioTable(docs), "doc_id", "media")
      .select(col("doc_id"),
        (col("sample_rate") >= 16000 &&
          expr("n_samples div sample_rate") >= 5).as("aud_ok"))
    val vid = Multimodal.videoHeaderFeatures(
        Multimodal.synthVideoTable(docs), "doc_id", "media")
      .select(col("doc_id"),
        (col("height") >= 480 &&
          expr("(duration * 1000) div timescale") >= 60000).as("vid_ok"))
    docs.select(col("doc_id"), col("source"))
      .join(img, Seq("doc_id")).join(aud, Seq("doc_id"))
      .join(vid, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("img_ok"), 1L).otherwise(0L)).as("n_img_ok"),
        sum(when(col("aud_ok"), 1L).otherwise(0L)).as("n_aud_ok"),
        sum(when(col("vid_ok"), 1L).otherwise(0L)).as("n_vid_ok"),
        sum(when(col("img_ok") && col("aud_ok") && col("vid_ok"), 1L)
          .otherwise(0L)).as("n_curated"))
      .orderBy(col("source"))
  }

  val specs: Seq[QuerySpec] = Seq(q50MediaStats, q57FrameSample,
    q87ImageHeaders, q103AudioHeaders, q129VideoHeaders,
    q135MediaCuration)
}
