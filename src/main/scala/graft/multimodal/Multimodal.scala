package graft.multimodal

import graft.etl.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed by batch-shaped partition functions — the Spark-side
  * skeleton of an image/audio/video pipeline.
  *
  * The actual decoders (JPEG/PNG decode, resampling, frame sampling) are
  * STUBS: no media codec libraries exist in this environment, so
  * [[decodeFeaturesStub]] computes a deterministic byte-histogram "feature
  * vector" in their place. Everything around the stub is real and tested:
  * the binary column schema, the metadata struct, the mapPartitions batch
  * shape (iterator-in/iterator-out, no per-row session objects), and the
  * partition-parallel execution — swap `histogram` for an actual decoder
  * and the pipeline is production-shaped.
  *
  * Scale notes (100 TB): payloads never enter a shuffle — feature
  * extraction is a narrow mapPartitions over the scan, and downstream
  * joins/groupBys carry only the fixed-width feature vector + metadata.
  */
object Multimodal {

  val FeatureDim = 16

  /** Media table derived from documents: payload = UTF-8 bytes of `text`
    * standing in for an encoded image/audio blob, plus typed metadata. */
  def media(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"), // a real pipeline: image/jpeg, audio/wav …
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("n_chars").as("n_bytes"),
        col("lang").as("source_lang"),
        col("source").as("origin")).as("meta"))

  /** STUB decoder: deterministic 16-bin byte histogram, L1-normalized.
    * Stands in for decode→resize→embed; same signature and batch shape. */
  private[graft] def histogram(payload: Array[Byte]): Array[Float] = {
    val counts = new Array[Int](FeatureDim)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xFF) % FeatureDim) += 1
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    counts.map(_ / n)
  }

  /** Batch feature extraction over the binary payload via mapPartitions —
    * iterator in/out so a real decoder could amortize per-batch setup
    * (model load, codec contexts) across the partition. */
  def decodeFeaturesStub(spark: SparkSession, mediaDf: DataFrame): DataFrame = {
    val sp = spark
    import sp.implicits._
    val feats = mediaDf.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup would go here (decoder/model init — STUB)
        rows.map { case (id, payload) =>
          val f = histogram(payload)
          val argmax = f.indices.maxBy(i => (f(i), -i)) // ties → lowest index
          (id, f, argmax)
        }
      }
      .toDF("media_id", "features", "dominant_bucket")
    mediaDf.select(col("media_id"), col("meta"))
      .join(feats, "media_id")
  }

  private val qmmMeta = QueryDef(
    "qmm_meta",
    build = (spark, sfDir) =>
      media(spark, sfDir)
        .select(
          col("media_id"),
          col("mime"),
          length(col("payload")).cast(LongType).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("meta.source_lang").as("source_lang"))
        .orderBy(col("media_id")),
    oracle = Some(
      // DuckDB md5 is VARCHAR-only; hashing the text hashes the same UTF-8
      // bytes Spark's encode() produced.
      "SELECT doc_id AS media_id, 'text/plain' AS mime, " +
        "CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, " +
        "md5(text) AS payload_md5, lang AS source_lang " +
        "FROM documents ORDER BY media_id"))

  /** No oracle: the mapPartitions stub is not SQL-expressible. Determinism
    * is covered by RegistrySpec's run-twice check; shape/values by
    * MultimodalSpec. */
  private val qmmFeatures = QueryDef(
    "qmm_features",
    build = (spark, sfDir) =>
      decodeFeaturesStub(spark, media(spark, sfDir))
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          // list columns crash the harness's pandas row-sort even on the
          // rows-only (no-oracle) path — emit the vector as a joined string
          array_join(transform(col("features"), x => x.cast(StringType)), ",")
            .as("features"), col("dominant_bucket"))
        .orderBy(col("media_id")),
    oracle = None)

  def defs: Seq[QueryDef] = Seq(qmmMeta, qmmFeatures)
}
