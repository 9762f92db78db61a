package graft

import graft.api.Graft
import org.apache.spark.sql.functions._

/** Direct coverage of the public operator API over hand-built frames
  * (the declared queries exercise these transitively; these tests pin the
  * contracts a library user depends on).
  */
class ApiSpec extends SparkFixture {

  test("topKByCosine returns k best matches in sim-desc order") {
    val sp = spark
    import sp.implicits._
    val vectors = Seq(
      (1L, Array(1.0f, 0.0f)),   // cos to query = 1.0
      (2L, Array(0.0f, 1.0f)),   // 0.0
      (3L, Array(-1.0f, 0.0f)),  // -1.0
      (4L, Array(1.0f, 1.0f)))   // ~0.707
      .toDF("vec_id", "embedding")
    val query = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("embedding")
    val top = Graft.topKByCosine(vectors, col("vec_id"), col("embedding"), query, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.map(_._1).toSeq == Seq(1L, 4L))
    assert(top(0)._2 == 1.0)
    assert(math.abs(top(1)._2 - math.sqrt(0.5)) < 1e-6)
  }

  test("ivfTopK assigns each vector to its best centroid, ties to lowest cid") {
    val sp = spark
    import sp.implicits._
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f))).toDF("cid", "c_emb")
    val vectors = Seq(
      (10L, Array(2.0f, 0.1f)),  // cell 0
      (11L, Array(0.1f, 3.0f)),  // cell 1
      (12L, Array(1.0f, 1.0f)))  // equidistant -> tie -> cid 0
      .toDF("vec_id", "embedding")
    val out = Graft.ivfTopK(vectors, col("vec_id"), col("embedding"), centroids, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap // cid -> but multiple...
    val byVec = Graft.ivfTopK(vectors, col("vec_id"), col("embedding"), centroids, k = 3)
      .collect().map(r => r.getLong(2) -> r.getLong(0)).toMap // vec_id -> cid
    assert(byVec(10L) == 0L && byVec(11L) == 1L)
    assert(byVec(12L) == 0L, "cosine tie must break to the lowest centroid id")
  }

  test("textQuality computes exact counts and average word length") {
    val sp = spark
    import sp.implicits._
    val df = Seq(Tuple1("the cat and the hat")).toDF("text")
    val r = Graft.textQuality(df, col("text")).collect()(0)
    assert(r.getAs[Long]("n_words") == 5)
    assert(r.getAs[Long]("n_uniq") == 4)  // "the" twice
    assert(r.getAs[Long]("n_stop") == 3)  // the, and, the
    assert(math.abs(r.getAs[Double]("avg_wlen") - 3.0) < 1e-12) // 15 chars / 5 words
  }

  test("fingerprint is stable under whitespace/punctuation noise") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("Hello,   World!", 1L),
      ("hello world", 2L)).toDF("text", "id")
    val fps = df.select(Graft.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).distinct
    assert(fps.length == 1, s"normalized forms should collide: ${fps.toSeq}")
  }

  test("simhash candidates find the duplicate pair at hamming 0") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val cands = Graft.simhashCandidates(
        Graft.simhashFingerprints(docs, col("doc_id"), col("text")), maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(cands.get((0L, 1L)).contains(0))
  }

  test("saltedJoin returns exactly the plain join's rows on a skewed key") {
    val sp = spark
    import sp.implicits._
    // 10% of fact rows pile onto key 0 — the hot-key shape salting targets
    val fact = (0 until 5000)
      .map(i => (if (i % 10 == 0) 0L else (i % 97).toLong, i.toLong)).toDF("k", "v")
    val dim = (0L until 97L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Graft.saltedJoin(fact, dim, "k", salt = 8).select("k", "v", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }
}
