package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

/** The multimodal plumbing is real even though the decoder is a stub:
  * binary payload schema, metadata struct, batch mapPartitions shape,
  * normalized fixed-dim features.
  */
class MultimodalSpec extends SparkFixture {

  test("media table exposes a binary payload with typed metadata") {
    val m = Multimodal.media(spark, sfTiny)
    assert(m.schema("payload").dataType == BinaryType)
    assert(m.schema("meta").dataType.isInstanceOf[StructType])
    val row = m.orderBy("media_id").limit(1).collect()(0)
    val payload = row.getAs[Array[Byte]]("payload")
    assert(payload.nonEmpty)
  }

  test("feature extraction: fixed dim, L1-normalized, partition-parallel") {
    val f = Multimodal.decodeFeaturesStub(spark, Multimodal.media(spark, sfTiny))
    val rows = f.orderBy("media_id").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val feats: scala.collection.Seq[Float] = r.getSeq[Float](r.fieldIndex("features"))
      assert(feats.length == Multimodal.FeatureDim)
      assert(math.abs(feats.sum - 1.0f) < 1e-3, s"not normalized: ${feats.sum}")
      val argmax = r.getAs[Int]("dominant_bucket")
      assert(feats(argmax) == feats.max)
    }
  }

  test("payload bytes round-trip: histogram of known bytes") {
    val h = Multimodal.histogram("aaab".getBytes("UTF-8"))
    // 'a' = 97 → bucket 97 % 16 = 1 ; 'b' = 98 → bucket 2
    assert(h(1) == 0.75f && h(2) == 0.25f)
  }

  test("qmm_meta byte lengths equal n_chars for the ASCII corpus") {
    val m = graft.etl.Registry.byName("qmm_meta").build(spark, sfTiny)
    val mismatch = m.join(graft.etl.Tables.documents(spark, sfTiny),
        col("media_id") === col("doc_id"))
      .filter(col("n_bytes") =!= col("n_chars"))
    assert(mismatch.count() == 0)
  }
}
