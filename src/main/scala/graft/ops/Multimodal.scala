package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing — SURVEY.md §2.9 X5.
  *
  * Images/audio/video are carried as opaque `binary` payload columns with
  * typed metadata, exactly how a 100 TB multimodal corpus rides through
  * Spark: the engine never interprets the bytes in the plan, decode
  * happens at the partition boundary in batch-shaped worker code
  * (`mapPartitions` over a typed Dataset — the Scala analog of
  * `mapInPandas`), and everything before/after the decode stage is
  * ordinary columnar pruning/filtering/shuffling on the metadata.
  *
  * The decode step itself is a **deterministic stub** (no codec libraries
  * in this environment — see `fakeDecode`): the Spark-side plumbing —
  * schema, typed Encoders, partition batching, feature schema — is real
  * and oracle-tested; swap `fakeDecode` for a JNI/ffmpeg/opencv call and
  * nothing else changes.
  */
object Multimodal {

  /** One media row: payload is the opaque blob, modality tags the codec
    * family (the fixture derives both from `documents` since the
    * testdata ships no binary table). */
  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])

  /** Decoded features. Fixed-width struct so the downstream plan is
    * columnar; `frame_hashes` stands in for sampled-frame embeddings. */
  case class MediaFeatures(
      doc_id: Long,
      modality: String,
      payload_len: Long,
      width: Long,
      height: Long,
      duration_ms: Long,
      frame_hashes: Seq[String])

  /** Multimodal fixture: text bytes as the payload, modality by id. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake standing in for a real codec.
    * A production decoder parses `payload` with an image/audio library;
    * this one derives plausible fields purely from the byte length so
    * tests and oracles are reproducible. Marked per the spec: the
    * Spark-side contract (runs per partition over an iterator — i.e.
    * batch-shaped, one decoder init per partition, not per row) is the
    * part under test. */
  private def fakeDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // Per-partition "decoder init" happens here (real code: load codec).
    rows.map { r =>
      val len = r.payload.length.toLong
      val (w, h, d) = r.modality match {
        case "image" => (64L + len % 576, 64L + len % 320, 0L)
        case "audio" => (0L, 0L, len * 8)
        case _       => (320L, 240L, len * 40)
      }
      // "Frame sampling": 3 evenly spaced 16-byte slices, hex-rendered —
      // stands in for per-frame feature vectors.
      val hashes = (0 until 3).map { i =>
        val off = (len * i / 3).toInt
        r.payload.slice(off, math.min(off + 16, len.toInt))
          .map("%02x".format(_)).mkString
      }
      MediaFeatures(r.doc_id, r.modality, len, w, h, d, hashes)
    }
  }

  /** Typed decode pass: Dataset[MediaRow] → mapPartitions → features. */
  def decoded(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions(fakeDecode _)
  }

  /** Oracle-checked projection of the decode output: every scalar field
    * is reproducible from the payload bytes, so DuckDB can verify the
    * whole mapPartitions path (frame hashes checked via their first
    * element; content hash via md5 of the payload). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decoded(s, dir)
      .select(
        col("doc_id"), col("modality"), col("payload_len"),
        col("width"), col("height"), col("duration_ms"),
        element_at(col("frame_hashes"), 1).as("first_frame"))
      .join(
        mediaTable(s, dir).select(col("doc_id"), md5(col("payload")).as("content_hash")),
        "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Frame-sample explode: one row per sampled frame with its hash —
    * the downstream shape of per-frame feature extraction (the oracle
    * recomputes every frame slice from the payload bytes, verifying
    * the typed decode's array output element by element). */
  def frameHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decoded(s, dir)
      .select(col("doc_id"),
        posexplode(col("frame_hashes")).as(Seq("frame_no", "frame_hash")))
      .withColumn("frame_no", col("frame_no").cast("bigint"))
      .select(col("doc_id"), col("frame_no"), col("frame_hash"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_multimodal_meta" -> mediaMeta,
    "q58_frame_hashes" -> frameHashes,
  )

  val oracles: Map[String, String] = Map(
    "q58_frame_hashes" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS payload FROM documents),
        |f AS (
        |  SELECT doc_id, i AS frame_no,
        |    lower(substr(hex(payload),
        |      CAST((octet_length(payload) * i) // 3 AS BIGINT) * 2 + 1, 32))
        |      AS frame_hash
        |  FROM m, LATERAL unnest(generate_series(0, 2)) AS t(i))
        |SELECT doc_id, frame_no, frame_hash FROM f
        |ORDER BY doc_id, frame_no""".stripMargin,
    "q40_multimodal_meta" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS modality,
        |    encode(text) AS payload, text
        |  FROM documents)
        |SELECT doc_id, modality,
        |  CAST(octet_length(payload) AS BIGINT) AS payload_len,
        |  CAST(CASE modality WHEN 'image' THEN 64 + octet_length(payload) % 576
        |       WHEN 'audio' THEN 0 ELSE 320 END AS BIGINT) AS width,
        |  CAST(CASE modality WHEN 'image' THEN 64 + octet_length(payload) % 320
        |       WHEN 'audio' THEN 0 ELSE 240 END AS BIGINT) AS height,
        |  CAST(CASE modality WHEN 'image' THEN 0
        |       WHEN 'audio' THEN octet_length(payload) * 8
        |       ELSE octet_length(payload) * 40 END AS BIGINT) AS duration_ms,
        |  lower(substr(hex(payload), 1, 32)) AS first_frame,
        |  md5(text) AS content_hash
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
