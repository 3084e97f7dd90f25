package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY §2.4): media as opaque `binary`
  * payloads with a typed metadata struct, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (features derived from the payload
  * md5) — but the Spark-side plumbing is real: schemas, batch shapes,
  * partition-parallel evaluation, and explode-based frame fan-out are
  * exactly what a libjpeg/ffmpeg-backed implementation would run under.
  */
object Multimodal {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** Media payload schema: (id, payload binary, meta struct). The
    * testdata has no binary table, so documents.text is encoded as the
    * stand-in payload — byte-faithful and deterministic.
    */
  def binarize(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("media_id"),
      encode(text, "UTF-8").as("payload"),
      struct(
        length(encode(text, "UTF-8")).cast("long").as("n_bytes"),
        lit("text/plain").as("format")).as("meta"))

  /** STUB decode — a real build links a codec here. Deterministic fake:
    * 4 float features from the payload digest, so downstream operators
    * (similarity, clustering) see realistic shapes.
    */
  def decodeStub(payload: Column): Column =
    transform(sequence(lit(0), lit(3)), i =>
      conv(substring(md5(payload), i * 2 + 1, lit(2)), 16, 10).cast("double") / 255.0)

  /** Frame sampling: one output row per sampled frame offset; a video
    * decoder would seek to `frame_idx`; the fake derives a per-frame
    * feature from (digest, frame_idx).
    */
  def sampleFrames(df: DataFrame, nFrames: Int): DataFrame =
    df.select(
      col("media_id"), col("meta"),
      posexplode(transform(sequence(lit(0), lit(nFrames - 1)), i =>
        md5(concat(md5(col("payload")), i.cast("string")))))
        .as(Seq("frame_idx", "frame_key")))

  /** Partition-batch decode — the Scala analog of a `mapInPandas` batch
    * UDF: one decoder instance per partition processes rows as an
    * iterator batch (exactly where a libjpeg/ffmpeg handle would be
    * opened once per partition and reused). The decode itself is the
    * deterministic stub; the iterator/batch plumbing, schema, and
    * per-partition lifecycle are the real thing.
    */
  final case class DecodedMedia(
      media_id: Long, n_bytes: Long, width: Int, height: Int, checksum: Long)

  def decodeBatch(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec" init happens here, once
        rows.map { case (id, payload) =>
          var crc = 0L
          var i = 0
          while (i < payload.length) { crc = crc * 31 + (payload(i) & 0xff); i += 1 }
          DecodedMedia(
            media_id = id,
            n_bytes = payload.length.toLong,
            width = (math.abs(crc) % 1920).toInt + 1,  // stub dims
            height = (math.abs(crc) % 1080).toInt + 1,
            checksum = crc)
        }
      }
  }

  // ---- declared queries ---------------------------------------------------

  /** Binary metadata extraction (oracle-checked: byte length + content
    * key are portable).
    */
  def q62(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        substring(md5(col("text")), 1, 8).as("content_key"))
      .orderBy("doc_id")

  /** Full plumbing pass: binarize → decode-stub features → 3-frame
    * sample; N docs in, 3N frame rows out. Oracle-checked since r5:
    * every output column is portable (the frame key is an md5 hex
    * string of (payload digest, frame index), never raw bytes), so
    * DuckDB replays the fan-out with UNNEST(range(0,3)).
    */
  def q63(s: SparkSession, dir: String): DataFrame = {
    val media = binarize(docs(s, dir), col("doc_id"), col("text"))
      .withColumn("features", decodeStub(col("payload")))
    sampleFrames(media, nFrames = 3)
      .select(
        col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_key"), col("meta.n_bytes").as("n_bytes"))
      .orderBy("media_id", "frame_idx")
  }

  /** q254 — vision-preprocessing PATCH GRID: tile each media's (stub)
    * W×H canvas into 224×224 patches — the ViT/CLIP input-prep fan-out
    * every image-training pipeline runs before the encoder. Stub dims
    * derive from the payload md5 (PORTABLE, unlike decodeBatch's Scala
    * crc — both engines parse the same hex), the tiling arithmetic is
    * the real thing: nx·ny = ceil(W/224)·ceil(H/224) patch rows per
    * media with edge patches clamped to the canvas.
    *
    * All-integer: hex-parsed dims, ceil via (w+223) DIV 224, clamp via
    * least(). Scale: row-local fan-out (the q63 posture) — ~12 patch
    * rows per media, no shuffle at all until a consumer aggregates.
    */
  def q254(s: SparkSession, dir: String): DataFrame = {
    val media = docs(s, dir).select(
      col("doc_id").as("media_id"),
      (conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 1920
        + 1).as("w"),
      (conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long") % 1080
        + 1).as("h"))
    media
      .withColumn("nx", expr("(w + 223) DIV 224"))
      .withColumn("ny", expr("(h + 223) DIV 224"))
      .select(col("media_id"), col("w"), col("h"), col("nx"), col("ny"),
        explode(sequence(lit(0L), col("ny") - 1)).as("py"))
      .select(col("media_id"), col("w"), col("h"), col("nx"), col("ny"),
        col("py"), explode(sequence(lit(0L), col("nx") - 1)).as("px"))
      .select(col("media_id"), (col("nx") * col("ny")).as("n_patches"),
        col("py"), col("px"),
        (col("px") * 224).as("x0"), (col("py") * 224).as("y0"),
        least(col("px") * 224 + 224, col("w")).as("x1"),
        least(col("py") * 224 + 224, col("h")).as("y1"))
      .orderBy("media_id", "py", "px")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_multimodal_meta"   -> (q62 _),
    "q63_multimodal_frames" -> (q63 _),
    "q254_patch_grid"       -> (q254 _),
  )

  val oracleSql: Map[String, String] = Map(
    "q62_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       substring(md5(text), 1, 8) AS content_key
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Same hex-derived stub dims, same ceil/clamp tiling arithmetic.
    "q254_patch_grid" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1
        |           AS w,
        |         CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1
        |           AS h
        |  FROM documents),
        |g AS (
        |  SELECT media_id, w, h,
        |         (w + 223) // 224 AS nx, (h + 223) // 224 AS ny
        |  FROM m),
        |p AS (
        |  SELECT media_id, w, h, nx, ny,
        |         UNNEST(range(0, ny)) AS py
        |  FROM g),
        |pp AS (
        |  SELECT media_id, w, h, nx, ny, py,
        |         UNNEST(range(0, nx)) AS px
        |  FROM p)
        |SELECT media_id, CAST(nx * ny AS BIGINT) AS n_patches,
        |       CAST(py AS BIGINT) AS py, CAST(px AS BIGINT) AS px,
        |       CAST(px * 224 AS BIGINT) AS x0, CAST(py * 224 AS BIGINT) AS y0,
        |       CAST(LEAST(px * 224 + 224, w) AS BIGINT) AS x1,
        |       CAST(LEAST(py * 224 + 224, h) AS BIGINT) AS y1
        |FROM pp
        |ORDER BY media_id, py, px""".stripMargin,
    // The frame fan-out replayed relationally: payload = UTF-8 bytes of
    // text, frame_key = md5(md5(payload) || frame_idx) — both engines
    // hash the same bytes, so the keys match exactly.
    "q63_multimodal_frames" ->
      """SELECT d.doc_id AS media_id,
        |       CAST(f.i AS BIGINT) AS frame_idx,
        |       md5(md5(d.text) || CAST(f.i AS VARCHAR)) AS frame_key,
        |       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes
        |FROM documents d, (SELECT UNNEST(range(0, 3)) AS i) f
        |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
