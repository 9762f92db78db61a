package graft.etl.ops

import graft.etl.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** §2.F sorts/limits/top-k and §2.G set operations & exact dedup.
  *
  * Determinism: ORDER BY keys are unique (D1) or the tied rows are
  * byte-identical (bag union on a single column). `qdedup_exact` keeps
  * `min(doc_id)` per text rather than `dropDuplicates` (arbitrary keeper,
  * D8). Scale: `orderBy.limit(k)` compiles to `TakeOrderedAndProjectExec`
  * (per-partition top-k + merge — no global sort); dedup is a hash
  * aggregation that shuffles once on the dedup key.
  */
object SetOps {

  private val qsortMultikey = QueryDef(
    "qsort_multikey",
    build = (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(asc("o_orderstatus"), desc("o_totalprice"), asc("o_orderkey"))
        .limit(100),
    oracle = Some(
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
        "ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC LIMIT 100"))

  private val qsortNulls = QueryDef(
    "qsort_nulls",
    build = (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(asc_nulls_first("o_totalprice"), asc("c_custkey"), asc_nulls_first("o_orderkey"))
    },
    oracle = Some(
      "SELECT c_custkey, o_orderkey, o_totalprice FROM customer " +
        "LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 400000.0 " +
        "ORDER BY o_totalprice ASC NULLS FIRST, c_custkey ASC, o_orderkey ASC NULLS FIRST"))

  private val qsetUnion = QueryDef(
    "qset_union",
    build = (spark, sfDir) => {
      val urgent = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val rich = Tables.customer(spark, sfDir)
        .filter(col("c_acctbal") > 9000.0)
        .select(col("c_custkey").as("custkey"))
      urgent.unionByName(rich).orderBy(col("custkey"))
    },
    oracle = Some(
      "SELECT custkey FROM (" +
        "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "UNION ALL SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000.0) " +
        "ORDER BY custkey"))

  private val qsetIntersect = QueryDef(
    "qset_intersect",
    build = (spark, sfDir) => {
      val withOrders = Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
      val positive = Tables.customer(spark, sfDir)
        .filter(col("c_acctbal") > 0.0)
        .select(col("c_custkey").as("custkey"))
      withOrders.intersect(positive).orderBy(col("custkey"))
    },
    oracle = Some(
      "SELECT o_custkey AS custkey FROM orders INTERSECT " +
        "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0.0 " +
        "ORDER BY custkey"))

  private val qsetExcept = QueryDef(
    "qset_except",
    build = (spark, sfDir) => {
      val all = Tables.customer(spark, sfDir).select(col("c_custkey").as("custkey"))
      val open = Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      all.except(open).orderBy(col("custkey"))
    },
    oracle = Some(
      "SELECT c_custkey AS custkey FROM customer EXCEPT " +
        "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O' " +
        "ORDER BY custkey"))

  /** Multiset intersection — INTERSECT ALL keeps min(multiplicity) per
    * row, the semantics dedup-aware reconciliation needs ("how many F
    * orders does each urgent customer have, capped by their urgent
    * count") where the distinct variant would collapse to membership.
    * Scale: Spark plans intersectAll as count-per-key aggregates on both
    * sides + a replicating generate — linear in rows, one keyed shuffle
    * per side, never a join explosion on duplicate keys. */
  private val qsetIntersectAll = QueryDef(
    "qset_intersect_all",
    build = (spark, sfDir) => {
      val f = Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val urgent = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      f.intersectAll(urgent).orderBy(col("custkey"))
    },
    oracle = Some(
      "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F' INTERSECT ALL " +
        "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "ORDER BY custkey"))

  /** Multiset difference — EXCEPT ALL subtracts multiplicities (each
    * open order cancels ONE occurrence), the CDC-flavored "what remains
    * after consuming matches" semantics. Same linear aggregate+generate
    * plan shape as [[qsetIntersectAll]]. */
  private val qsetExceptAll = QueryDef(
    "qset_except_all",
    build = (spark, sfDir) => {
      val all = Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
      val open = Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      all.exceptAll(open).orderBy(col("custkey"))
    },
    oracle = Some(
      "SELECT o_custkey AS custkey FROM orders EXCEPT ALL " +
        "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O' " +
        "ORDER BY custkey"))

  private val qsetDistinct = QueryDef(
    "qset_distinct",
    build = (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey")),
    oracle = Some(
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer " +
        "ORDER BY c_mktsegment, c_nationkey"))

  private val qdedupExact = QueryDef(
    "qdedup_exact",
    build = (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), md5(col("text")).as("text_md5"), col("n_copies"))
        .orderBy(col("doc_id")),
    oracle = Some(
      "SELECT min(doc_id) AS doc_id, md5(text) AS text_md5, count(*) AS n_copies " +
        "FROM documents GROUP BY text ORDER BY doc_id"))

  /** Pair→cluster resolution: connected components over the n-gram
    * Jaccard near-dup candidate graph ([[graft.api.Graft.dedupClusters]],
    * iterative min-label propagation) — the step between "pairs found"
    * and "duplicates dropped". `cluster` = smallest doc_id of the
    * component, so the deterministic keeper is `doc_id == cluster` (D8).
    * Similarity is not transitive, so components genuinely chain beyond
    * the pair list (A~B, B~C without A~C) — the oracle replicates the
    * closure with a recursive CTE over the same pair SQL. */
  private val qdedupClusters = QueryDef(
    "qdedup_clusters",
    build = (spark, sfDir) => {
      val sh = graft.api.Graft
        .shingleHashes(Tables.documents(spark, sfDir), col("doc_id"), col("text"))
        .select(col("doc_id"), col("h64").as("sh"))
      // jaccard ≥ 1/2: tighter than the qllm_ngram_jaccard 1/4 cut so the
      // component structure is non-trivial (≈20 clusters at sf0.01, sizes
      // 2..206 — verified), not one hairball
      val pairs = graft.api.Graft.jaccardCandidates(sh, dfCap = 20, minNum = 1, minDen = 2)
      graft.api.Graft.dedupClusters(pairs, "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(
      "WITH RECURSIVE toks AS (SELECT doc_id, unnest(str_split(lower(text), ' ')) AS word, " +
        "generate_subscripts(str_split(lower(text), ' '), 1) AS pos FROM documents), " +
        "sh AS (SELECT DISTINCT a.doc_id, concat(a.word, ' ', b.word) AS s " +
        "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), " +
        "keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 20), " +
        "shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)), " +
        "cnt AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id), " +
        "pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_common " +
        "FROM shf x JOIN shf y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2), " +
        "cand AS (SELECT doc_a, doc_b FROM pairs " +
        "JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b " +
        "WHERE n_common * 2 >= ca.n_sh + cb.n_sh - n_common), " +
        "e AS (SELECT doc_a AS src, doc_b AS dst FROM cand " +
        "UNION SELECT doc_b, doc_a FROM cand), " +
        "walk AS (SELECT src AS id, src AS lbl FROM e " +
        "UNION SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.id) " +
        "SELECT id AS doc_id, min(lbl) AS cluster FROM walk GROUP BY id ORDER BY doc_id"))

  /** CDC changeset application (MERGE/upsert semantics without a table
    * format): base LEFT JOIN updates (changed columns coalesce), anti-join
    * deletes, union inserts. The changeset is derived deterministically
    * from the fixture (keys ≡ 3 mod 10 update, ≡ 7 mod 10 delete, inserts
    * re-keyed above the base range) so the oracle replicates it exactly.
    * At 100 TB this is one key-partitioned join + an anti-join — the
    * files-only fallback where a MERGE-capable table format isn't
    * available; op provenance is emitted per row ('U'/'K'/'I'). */
  private val qsetUpsert = QueryDef(
    "qset_upsert",
    build = (spark, sfDir) => {
      val base = Tables.orders(spark, sfDir)
      val updates = base.filter(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey"), (col("o_totalprice") + 100.0).as("new_price"))
      val deletes = base.filter(col("o_orderkey") % 10 === 7)
        .select(col("o_orderkey"))
      val inserts = base.filter(col("o_orderkey") % 10 === 1)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), (col("o_totalprice") / 2.0).as("price"), lit("I").as("op"))
      val kept = base
        .join(deletes.withColumnRenamed("o_orderkey", "__del"),
          col("o_orderkey") === col("__del"), "left_anti")
        .join(updates, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"),
          coalesce(col("new_price"), col("o_totalprice")).as("price"),
          when(col("new_price").isNotNull, "U").otherwise("K").as("op"))
      kept.unionByName(inserts).orderBy(col("o_orderkey"))
    },
    oracle = Some(
      "WITH upd AS (SELECT o_orderkey, o_totalprice + 100.0 AS new_price FROM orders WHERE o_orderkey % 10 = 3), " +
        "del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 7), " +
        "ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey, " +
        "o_totalprice / 2.0 AS price, 'I' AS op FROM orders WHERE o_orderkey % 10 = 1), " +
        "kept AS (SELECT b.o_orderkey, b.o_custkey, " +
        "coalesce(u.new_price, b.o_totalprice) AS price, " +
        "CASE WHEN u.o_orderkey IS NOT NULL THEN 'U' ELSE 'K' END AS op " +
        "FROM orders b LEFT JOIN upd u ON b.o_orderkey = u.o_orderkey " +
        "WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM del)) " +
        "SELECT * FROM kept UNION ALL SELECT * FROM ins ORDER BY o_orderkey"))

  /** CDC snapshot diff — the complement of [[qsetUpsert]]: given two full
    * snapshots, emit the change feed (op ∈ I/U/D) a downstream incremental
    * consumer would apply. Both snapshots derive DETERMINISTICALLY from
    * `orders` (deletes where key%7=3, +100.00 price updates where key%5=2,
    * inserts as negated keys where key%11=5) so both engines construct
    * byte-identical inputs. The diff itself is one FULL OUTER equi-join on
    * the key + an exact DECIMAL(12,2) value compare (never double
    * equality), filtered to changed rows. Scale: one key-partitioned
    * shuffle join; unchanged rows (the overwhelming majority of a real
    * snapshot pair) are dropped BEFORE the orderBy, so the output stage
    * sees only the delta. */
  private val qsetCdcdiff = QueryDef(
    "qset_cdcdiff",
    build = (spark, sfDir) => {
      import org.apache.spark.sql.types.DecimalType
      val p = col("o_totalprice").cast(DecimalType(12, 2))
      val orders = Tables.orders(spark, sfDir)
      val old = orders.select(col("o_orderkey").as("k"), p.as("p"))
      val news = orders.filter(col("o_orderkey") % 7 =!= 3)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 5 === 2, p + 100).otherwise(p).as("p"))
        .unionByName(orders.filter(col("o_orderkey") % 11 === 5)
          .select((-col("o_orderkey")).as("k"), p.as("p")))
      old.as("o").join(news.as("n"), col("o.k") === col("n.k"), "full_outer")
        .select(
          coalesce(col("o.k"), col("n.k")).as("o_orderkey"),
          when(col("o.k").isNull, "I")
            .when(col("n.k").isNull, "D")
            .when(col("o.p") =!= col("n.p"), "U").as("op"),
          col("o.p").cast("string").as("old_price"),
          col("n.p").cast("string").as("new_price"))
        .filter(col("op").isNotNull)
        .orderBy(col("o_orderkey"))
    },
    oracle = Some(
      "WITH old AS (SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS p FROM orders), " +
        "new AS (SELECT o_orderkey AS k, CASE WHEN o_orderkey % 5 = 2 " +
        "THEN CAST(o_totalprice AS DECIMAL(12,2)) + 100 ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS p " +
        "FROM orders WHERE o_orderkey % 7 <> 3 " +
        "UNION ALL SELECT -o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS p " +
        "FROM orders WHERE o_orderkey % 11 = 5), " +
        "j AS (SELECT coalesce(old.k, new.k) AS o_orderkey, " +
        "CASE WHEN old.k IS NULL THEN 'I' WHEN new.k IS NULL THEN 'D' " +
        "WHEN old.p <> new.p THEN 'U' ELSE NULL END AS op, " +
        "CAST(old.p AS STRING) AS old_price, CAST(new.p AS STRING) AS new_price " +
        "FROM old FULL OUTER JOIN new ON old.k = new.k) " +
        "SELECT * FROM j WHERE op IS NOT NULL ORDER BY o_orderkey"))

  /** Z-order (Morton) clustering key over a 1024×1024 (user, value) grid —
    * the data-LAYOUT op (`Graft.zorderKey`): sorting by the interleaved
    * key clusters rows so 2-D box predicates touch a contiguous z-range
    * (power-of-2-aligned boxes exactly — ApiSpec), which is what lets
    * parquet min/max row-group pruning serve BOTH filter columns at once
    * at 100 TB. The key is pure shift/and/or arithmetic, so the oracle
    * states the identical unrolled expression and the `orderBy.limit`
    * compiles to TakeOrderedAndProject (no global sort). Ties cannot
    * occur: event_id is unique and last in the key. */
  private val qsortZorder = QueryDef(
    "qsort_zorder",
    build = (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
        .select(
          col("event_id"),
          pmod(col("user_id"), lit(1024L)).as("gx"),
          least(greatest(floor(col("value")).cast("long"), lit(0L)), lit(1023L)).as("gy"))
      e.withColumn("z", graft.api.Graft.zorderKey(col("gx"), col("gy"), bits = 10))
        .orderBy(col("z"), col("event_id"))
        .limit(200)
    },
    oracle = Some {
      val terms = (0 until 10).flatMap(i => Seq(
        s"(((gx >> $i) & 1) << ${2 * i})",
        s"(((gy >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      // ((x % m) + m) % m = Spark's pmod for any sign; DuckDB's bare `%`
      // matches pmod only for non-negative user_id — don't rely on that
      "WITH g AS (SELECT event_id, ((user_id % 1024) + 1024) % 1024 AS gx, " +
        "least(greatest(CAST(floor(value) AS BIGINT), 0), 1023) AS gy FROM events) " +
        s"SELECT event_id, gx, gy, $terms AS z FROM g " +
        "ORDER BY z, event_id LIMIT 200"
    })

  /** Sorted-neighborhood entity-resolution blocking — the classic
    * linear-time alternative to all-pairs fuzzy matching: records sort
    * by a blocking key (here: lowercased part name within brand) and
    * only ADJACENT records are compared, with character-trigram Jaccard
    * as the similarity. Each row is one neighbor pair with its exact
    * trigram-overlap counts, the IEEE-division similarity, and an
    * integer-predicate candidate verdict (2·inter ≥ union ⇔ J ≥ 0.5 —
    * no double threshold compare). Names shorter than 3 chars carry no
    * trigram and are excluded by contract.
    *
    * Scale: THE point of the technique — one window shuffle+sort keyed
    * by brand (25-value key here; a real deployment blocks on a finer
    * prefix key) and a map-side trigram compare per adjacent pair;
    * nothing is quadratic. Trigrams are built by both engines from the
    * same substring(i, 3) enumeration. */
  private val qdedupSortedNbr = QueryDef(
    "qdedup_sorted_nbr",
    build = (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val p = Tables.part(spark, sfDir)
        .select(col("p_brand"), col("p_partkey"), lower(col("p_name")).as("nm"))
        .filter(length(col("nm")) >= 3)
      val w = Window.partitionBy(col("p_brand")).orderBy(col("nm"), col("p_partkey"))
      def tri(c: String): org.apache.spark.sql.Column = expr(
        s"array_distinct(transform(sequence(1, length($c) - 2), i -> substring($c, i, 3)))")
      p.withColumn("nm2", lead(col("nm"), 1).over(w))
        .withColumn("key_b", lead(col("p_partkey"), 1).over(w))
        .filter(col("nm2").isNotNull)
        .select(col("p_brand"), col("p_partkey").as("key_a"), col("key_b"),
          size(tri("nm")).as("n_a"), size(tri("nm2")).as("n_b"),
          size(array_intersect(tri("nm"), tri("nm2"))).as("n_inter"))
        .select(col("p_brand"), col("key_a"), col("key_b"),
          col("n_a"), col("n_b"), col("n_inter"),
          (col("n_inter").cast(org.apache.spark.sql.types.DoubleType) /
            (col("n_a") + col("n_b") - col("n_inter"))
              .cast(org.apache.spark.sql.types.DoubleType)).as("jaccard"),
          when(col("n_inter") * 2 >= col("n_a") + col("n_b") - col("n_inter"),
            lit("candidate")).otherwise(lit("distinct")).as("verdict"))
        .orderBy(col("p_brand"), col("key_a"))
    },
    oracle = Some(
      "WITH p AS (SELECT p_brand, p_partkey, lower(p_name) AS nm FROM part " +
        "WHERE length(lower(p_name)) >= 3), " +
        "nb AS (SELECT p_brand, p_partkey AS key_a, nm, " +
        "lead(nm, 1) OVER (PARTITION BY p_brand ORDER BY nm, p_partkey) AS nm2, " +
        "lead(p_partkey, 1) OVER (PARTITION BY p_brand ORDER BY nm, p_partkey) AS key_b " +
        "FROM p), " +
        "t AS (SELECT p_brand, key_a, key_b, " +
        "CAST(len(list_distinct(list_transform(generate_series(1, length(nm) - 2), i -> substring(nm, i, 3)))) AS INTEGER) AS n_a, " +
        "CAST(len(list_distinct(list_transform(generate_series(1, length(nm2) - 2), i -> substring(nm2, i, 3)))) AS INTEGER) AS n_b, " +
        "CAST(len(list_intersect(" +
        "list_distinct(list_transform(generate_series(1, length(nm) - 2), i -> substring(nm, i, 3))), " +
        "list_distinct(list_transform(generate_series(1, length(nm2) - 2), i -> substring(nm2, i, 3))))) AS INTEGER) AS n_inter " +
        "FROM nb WHERE nm2 IS NOT NULL) " +
        "SELECT p_brand, key_a, key_b, n_a, n_b, n_inter, " +
        "CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) AS jaccard, " +
        "CASE WHEN n_inter * 2 >= n_a + n_b - n_inter THEN 'candidate' ELSE 'distinct' END AS verdict " +
        "FROM t ORDER BY p_brand, key_a"))

  /** Keyset (seek-method) pagination — the 100 TB-safe alternative to
    * OFFSET: the next page is `WHERE (k1, k2) > cursor ORDER BY k1, k2
    * LIMIT n`, which plans as a pushed-down predicate plus
    * TakeOrderedAndProject (per-partition top-k, k-row merge) — no scan
    * of the skipped prefix, no global sort, unlike OFFSET which must
    * produce and discard every earlier row. Cursor = the (brand,
    * partkey) pair a previous page ended on; (p_brand, p_partkey) is a
    * total order because partkey is unique. */
  private val qsortKeyset = QueryDef(
    "qsort_keyset",
    build = (spark, sfDir) =>
      Tables.part(spark, sfDir)
        .filter(col("p_brand") > "Brand#3" ||
          (col("p_brand") === "Brand#3" && col("p_partkey") > 40L))
        .select(col("p_brand"), col("p_partkey"), col("p_name"))
        .orderBy(col("p_brand"), col("p_partkey"))
        .limit(25),
    oracle = Some(
      "SELECT p_brand, p_partkey, p_name FROM part " +
        "WHERE p_brand > 'Brand#3' OR (p_brand = 'Brand#3' AND p_partkey > 40) " +
        "ORDER BY p_brand, p_partkey LIMIT 25"))

  /** Symmetric difference of two derived key sets — which parts shipped
    * in exactly ONE half of 1995 (the churn-style set comparison behind
    * assortments/inventory diffs): both halves reduce to distinct key
    * sets, ONE full-outer keyed join decides the verdict, and
    * both-present rows drop out. Output is (key, only_in) with a total
    * order. Scale: two scan-filtered distincts + one keyed join — the
    * same shape at any size; no EXCEPT/UNION pair re-shuffling the
    * bigger side twice. */
  private val qsetSymdiff = QueryDef(
    "qset_symdiff",
    build = (spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      def half(from: String, until: String) = li
        .filter(col("l_shipdate") >= to_date(lit(from)) &&
          col("l_shipdate") < to_date(lit(until)))
        .select(col("l_partkey")).distinct()
      val h1 = half("1995-01-01", "1995-07-01").withColumn("in_h1", lit(1))
      val h2 = half("1995-07-01", "1996-01-01").withColumn("in_h2", lit(1))
      h1.join(h2, Seq("l_partkey"), "full_outer")
        .filter(col("in_h1").isNull || col("in_h2").isNull)
        .select(col("l_partkey"),
          when(col("in_h1") === 1, "h1_only").otherwise("h2_only").as("only_in"))
        .orderBy(col("l_partkey"))
    },
    oracle = Some(
      "WITH h1 AS (SELECT DISTINCT l_partkey FROM lineitem " +
        "WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-07-01'), " +
        "h2 AS (SELECT DISTINCT l_partkey FROM lineitem " +
        "WHERE l_shipdate >= DATE '1995-07-01' AND l_shipdate < DATE '1996-01-01'), " +
        "j AS (SELECT COALESCE(h1.l_partkey, h2.l_partkey) AS l_partkey, " +
        "h1.l_partkey IS NOT NULL AS a, h2.l_partkey IS NOT NULL AS b " +
        "FROM h1 FULL OUTER JOIN h2 ON h1.l_partkey = h2.l_partkey) " +
        "SELECT l_partkey, CASE WHEN a THEN 'h1_only' ELSE 'h2_only' END AS only_in " +
        "FROM j WHERE NOT (a AND b) ORDER BY l_partkey"))

  def defs: Seq[QueryDef] = Seq(
    qsortMultikey, qsortNulls, qsetUnion, qsetIntersect, qsetExcept,
    qsetIntersectAll, qsetExceptAll,
    qsetDistinct, qdedupExact, qdedupClusters, qsetUpsert, qsetCdcdiff,
    qsortZorder, qdedupSortedNbr, qsortKeyset, qsetSymdiff)
}
