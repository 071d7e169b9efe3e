package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import TextOps.idiv

/** Multimodal-column plumbing: media payloads modeled as opaque `binary`
  * columns with typed metadata, plus a decode/feature-extract stage run
  * as a typed `mapPartitions` over the payload batches.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * STUB — [[StubDecoder]] derives deterministic fake features (md5-based
  * "dimensions", arithmetic "mean sample") from the payload bytes. The
  * Spark-side plumbing is real and is the part that matters at scale:
  * binary schema, per-partition batch iteration (one decoder init per
  * partition, not per row — exactly how a JNI codec or Python worker
  * would be amortized), and a narrow no-shuffle plan.
  *
  * Scale notes (100 TB of media): payloads dominate row size, so
  * `binary` columns ride parquet's byte-array encoding; decode stages
  * must be mapPartitions (amortized codec init) and must never shuffle
  * payloads — extract features first, shuffle features only. Row-group
  * sizing (`parquet.block.size`) and `maxPartitionBytes` bound executor
  * memory per task.
  */
object Multimodal {

  /** m1: binary metadata projection — payload byte length, content hash,
    * 4-byte header as uppercase hex (magic-number sniffing), all from
    * Catalyst built-ins over the binary column (no decode). */
  def m1BinaryMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_md5"),
        hex(substring(col("payload"), 1, 4)).as("header_hex"))
      .transform(Output.ordered(_, col("doc_id")))

  /** One decoded media item (the stub's fake feature record). */
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Long, height: Long,
      mean_sample: Long, content_md5: String)

  /** STUB media decoder — stands in for an image/audio codec that is not
    * available in this environment. Deterministic pure function of the
    * payload bytes; swap `decode` for a real codec (libjpeg/ffmpeg via
    * JNI, or an Arrow-batched Python worker) without touching the
    * surrounding plumbing. */
  object StubDecoder {
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val md = MessageDigest.getInstance("MD5")
      val hash = md.digest(payload).map("%02x".format(_)).mkString
      // ??? real codec goes here — fake "dimensions" from the hash,
      // fake "mean sample" from the length, both engine-portable.
      val w = 16L + (hash.charAt(0).toLong % 16L)
      val h = 16L + (hash.charAt(1).toLong % 16L)
      val mean = (payload.length.toLong * 31L + 7L) % 256L
      MediaFeatures(docId, payload.length.toLong, w, h, mean, hash)
    }
  }

  /** m2: decode/feature-extract over payload partitions. The decoder is
    * instantiated once per partition (amortization point); rows stream
    * through without materializing the partition. */
  def m2DecodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payloads: Dataset[(Long, Array[Byte])] = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      // per-partition decoder init would live here (codec handle, model…)
      it.map { case (id, bytes) => StubDecoder.decode(id, bytes) }
    }.toDF()
      .transform(Output.ordered(_, col("doc_id")))
  }

  /** Thumbnail sample count (m3): 64 strided samples ≈ an 8×8 thumb. */
  val ThumbSamples = 64
  /** Frame grid (m4): payload split into 16 "frames", every 4th kept. */
  val NFrames = 16
  val FrameStride = 4

  /** m3: resize — strided downsample of the payload to a fixed-size
    * "thumbnail" (every ⌈len/64⌉-th unit, 64 samples), the shape of an
    * image resize with the pixel decode stubbed to byte sampling. Pure
    * Catalyst expressions: at scale this is a narrow codegen'd map over
    * the payload column, no shuffle. */
  def m3Resize(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text").as("payload"),
        length(col("text")).cast("long").as("n_units"))
      .select(col("doc_id"), col("n_units"),
        greatest(idiv(col("n_units"), lit(ThumbSamples.toLong)), lit(1L)).as("stride"),
        col("payload"))
      .select(
        col("doc_id"), col("n_units"), col("stride"),
        array_join(
          transform(sequence(lit(0L), lit(ThumbSamples.toLong - 1)),
            i => col("payload").substr((i * col("stride") + 1L).cast("int"), lit(1))),
          "").as("thumb"))
      .select(col("doc_id"), col("n_units"), col("stride"),
        length(col("thumb")).cast("long").as("thumb_units"),
        md5(col("thumb")).as("thumb_md5"))
      .transform(Output.ordered(_, col("doc_id")))

  /** m4: frame sampling — payload treated as NFrames fixed-length
    * frames; every FrameStride-th frame is extracted and fingerprinted
    * (one output row per sampled frame — the explode is the real
    * plumbing; a video pipeline emits frames exactly like this). */
  def m4FrameSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text").as("payload"),
        greatest(idiv(length(col("text")).cast("long"), lit(NFrames.toLong)), lit(1L))
          .as("frame_len"))
      .select(col("doc_id"), col("frame_len"),
        posexplode(
          transform(
            sequence(lit(0L), lit((NFrames / FrameStride).toLong - 1)),
            k => col("payload").substr(
              (k * FrameStride.toLong * col("frame_len") + 1L).cast("int"),
              col("frame_len").cast("int"))))
          .as(Seq("sample_idx", "frame")))
      .filter(length(col("frame")) > 0)
      .select(col("doc_id"),
        (col("sample_idx").cast("long") * FrameStride.toLong).as("frame_idx"),
        col("frame_len"),
        length(col("frame")).cast("long").as("frame_units"),
        md5(col("frame")).as("frame_md5"))
      .transform(Output.ordered(_, col("doc_id"), col("frame_idx")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta"     -> m1BinaryMeta _,
    "m2_decode_features" -> m2DecodeFeatures _,
    "m3_resize"          -> m3Resize _,
    "m4_frame_sample"    -> m4FrameSample _,
  )

  def oracleSql: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  upper(substr(hex(CAST(text AS BLOB)), 1, 8)) AS header_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The stub's fake features are deliberately SQL-expressible so even
    // the decode stage is oracle-checked (a real codec would be
    // rows-only checked).
    "m2_decode_features" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  16 + ascii(substr(md5(text), 1, 1)) % 16 AS width,
        |  16 + ascii(substr(md5(text), 2, 1)) % 16 AS height,
        |  (CAST(length(text) AS BIGINT) * 31 + 7) % 256 AS mean_sample,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m3_resize" ->
      s"""WITH p AS (SELECT doc_id, text AS payload,
         |    CAST(length(text) AS BIGINT) AS n_units,
         |    greatest(CAST(length(text) AS BIGINT) // $ThumbSamples, 1) AS stride
         |  FROM documents),
         |t AS (SELECT doc_id, n_units, stride,
         |    list_aggregate(list_transform(range(0, $ThumbSamples),
         |      i -> substr(payload, CAST(i * stride + 1 AS INT), 1)),
         |      'string_agg', '') AS thumb
         |  FROM p)
         |SELECT doc_id, n_units, stride,
         |  CAST(length(thumb) AS BIGINT) AS thumb_units,
         |  md5(thumb) AS thumb_md5
         |FROM t ORDER BY doc_id""".stripMargin,
    "m4_frame_sample" ->
      s"""WITH p AS (SELECT doc_id, text AS payload,
         |    greatest(CAST(length(text) AS BIGINT) // $NFrames, 1) AS frame_len
         |  FROM documents),
         |f AS (SELECT doc_id, frame_len,
         |    CAST(k * $FrameStride AS BIGINT) AS frame_idx,
         |    substr(payload, CAST(k * $FrameStride * frame_len + 1 AS INT),
         |      CAST(frame_len AS INT)) AS frame
         |  FROM p CROSS JOIN (SELECT unnest(range(0, ${NFrames / FrameStride})) AS k))
         |SELECT doc_id, frame_idx, frame_len,
         |  CAST(length(frame) AS BIGINT) AS frame_units, md5(frame) AS frame_md5
         |FROM f WHERE length(frame) > 0
         |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
