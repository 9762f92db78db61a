package graft

import graft.etl.Registry
import org.apache.spark.sql.functions._

/** SURVEY §5.3 property checks for the no-oracle sketch operators and the
  * vector kit (these have no DuckDB gate, so their correctness evidence
  * lives here).
  */
class LlmSpec extends SparkFixture {

  private def run(name: String) = Registry.byName(name).build(spark, sfTiny)

  // documents only contain duplicate texts at sf0.1 (FIXTURES.md)
  private val sfBench = "/root/testdata/sf0.1"
  private def textDupPairs(sfDir: String): Set[(Long, Long)] = {
    val docs = graft.etl.Tables.documents(spark, sfDir)
    docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash: duplicate texts are found by LSH banding with estimate 1.0") {
    val dups = textDupPairs(sfBench)
    assert(dups.nonEmpty, "fixture should contain duplicate texts at sf0.1")
    val est = Registry.byName("qllm_minhash").build(spark, sfBench)
      .select("doc_a", "doc_b", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est.nonEmpty, "banding produced no candidate pairs")
    dups.foreach { p =>
      assert(est.get(p).contains(1.0), s"dup pair $p missing or est != 1.0: ${est.get(p)}")
    }
  }

  test("minhash estimates stay in [0,1]; pairs are canonical (a < b)") {
    run("qllm_minhash").collect().foreach { r =>
      val (a, b, e) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      assert(a < b)
      assert(e >= 0.0 && e <= 1.0)
    }
  }

  test("simhash: exact duplicate texts end up CONNECTED at hamming 0") {
    // round-8 contract: candidates are a connectivity-complete EDGE set
    // (star edges per identical-fp group + capped near-band edges), not
    // the quadratic all-pairs list — so the property is that every exact
    // dup pair lands in one hamming-0 component, not that the literal
    // pair row exists.
    val dupPairs = textDupPairs(sfBench)
    assert(dupPairs.nonEmpty, "fixture should contain duplicate texts at sf0.1")
    val edges = Registry.byName("qllm_simhash").build(spark, sfBench).collect()
      .filter(_.getInt(2) == 0).map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    dupPairs.foreach { case (a, b) =>
      assert(find(a) == find(b), s"dup pair ($a,$b) not connected at hamming 0")
    }
  }

  test("approx_count_distinct within 5% of exact per event_type") {
    val approx = run("qagg_approxhll").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.etl.Tables.events(spark, sfTiny)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$k approx=$a exact=$n")
    }
  }

  test("cosine similarity is in [-1, 1] and self-similarity is 1") {
    val top = run("qllm_simsearch").collect()
    assert(top.length == 10)
    top.foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-12))
    // dot_self from qarray_funcs vs norms: cos(v, v) == 1 within fp noise
    val e = Registry.byName("qarray_funcs").build(spark, sfTiny).limit(5).collect()
    e.foreach(r => assert(r.getAs[Double]("dot_self") > 0.0)) // dot_self positive
  }

  test("dedup is idempotent: re-deduplicating the dedup output is a no-op") {
    val once = run("qdedup_exact")
    assert(once.count() == once.dropDuplicates("text_md5").count())
    val norm = run("qllm_dedup_norm")
    assert(norm.count() == norm.dropDuplicates("norm_md5").count())
  }

  test("dedup_norm finds its planted twins (non-vacuous gate evidence)") {
    // Round-13 verdict task 1: the fixture has no normalized dups below
    // sf0.1, so the key's oracle gate used to pass on an EMPTY frame. The
    // declared query now plants perturbed twins of doc_id 0,1,2 — assert
    // the exact groups so a broken normalizer, groupBy key, or >1 filter
    // can no longer pass silently.
    val rows = run("qllm_dedup_norm").collect()
    assert(rows.length >= 3, s"expected >= 3 planted groups, got ${rows.length}")
    val byMin = rows.map(r => r.getAs[Long]("min_doc") ->
      (r.getAs[Long]("max_doc"), r.getAs[Long]("n_copies"))).toMap
    // doc 0 planted twice (plantA +1e12, plantB +2e12) => 3 copies; the
    // 10^12 offsets sit beyond any plausible corpus size (round-13
    // advice: +1e6/+2e6 collided with real doc_ids from ~sf20 up), so
    // these exact triples hold at every rung, not just below 1 M docs
    assert(byMin(0L) == ((2000000000000L, 3L)), s"group 0: ${byMin(0L)}")
    assert(byMin(1L) == ((1000000000001L, 2L)), s"group 1: ${byMin(1L)}")
    assert(byMin(2L) == ((1000000000002L, 2L)), s"group 2: ${byMin(2L)}")
  }

  test("shared normalizer collapses case/whitespace/punct variants to one key") {
    // The planted-frame check the round-12 verdict asked for: the SAME
    // normalizer the declared key groups on, over hand-planted variants.
    val sp = spark
    import sp.implicits._
    val planted = Seq(
      (0L, "Hello, World!"), (1L, "  hello   world "), (2L, "HELLO?? world"),
      (3L, "another text entirely")).toDF("doc_id", "text")
    val groups = planted
      .groupBy(graft.functions.TextFunctions.normalize_text(col("text")).as("norm"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .collect().map(r => r.getAs[String]("norm") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc")))).toMap
    assert(groups.size == 2, s"expected 2 normalized keys, got $groups")
    assert(groups("hello world") == ((3L, 0L, 2L)), s"dup group: $groups")
    assert(groups("another text entirely") == ((1L, 3L, 3L)))
  }
}
