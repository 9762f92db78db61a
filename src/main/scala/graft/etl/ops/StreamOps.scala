package graft.etl.ops

import graft.etl.{QueryDef, Tables}
import graft.etl.Dets._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.J streaming operators, declared in batch-equivalent form (Verify
  * writes Parquet). The aggregation cores (`tumblingAgg`/`slidingAgg`/
  * `sessionAgg`) are shared verbatim with the Structured Streaming suite
  * (StreamingSpec) which runs them under MemoryStream + watermark — the
  * same code, micro-batched, proving watermark/state semantics.
  *
  * D6: window bounds are emitted as epoch seconds/micros BIGINT, never raw
  * timestamps (events.ts is ns in Parquet, µs in Spark, ns in DuckDB).
  * Spark tumbling/sliding windows align to the epoch origin — the DuckDB
  * oracle replicates alignment with time_bucket / double-bucket unnest,
  * and session bounds with a gaps-and-islands rewrite (a gap STRICTLY
  * greater than 30 min opens a new session — Spark's session_window merges
  * an event landing exactly on the previous session's end).
  */
object StreamOps {

  /** Shared with StreamingSpec: count/sum per (1h tumbling window, type). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(d124(col("value"))).cast(DecimalType(38, 4)).as("sum_value"))

  private val qstreamTumbling = QueryDef(
    "qstream_tumbling",
    build = (spark, sfDir) =>
      tumblingAgg(Tables.events(spark, sfDir))
        .select(col("window.start").cast(LongType).as("ws"), col("event_type"),
          col("n"), decStr(col("sum_value")).as("sum_value"))
        .orderBy(col("ws"), col("event_type")),
    oracle = Some(
      "WITH e AS (SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w, " +
        "event_type, CAST(value AS DECIMAL(12,4)) AS v FROM events) " +
        "SELECT CAST(epoch_us(w) // 1000000 AS BIGINT) AS ws, event_type, " +
        "count(*) AS n, CAST(CAST(sum(v) AS DECIMAL(38,4)) AS STRING) AS sum_value " +
        "FROM e GROUP BY w, event_type ORDER BY ws, event_type"))

  /** Shared with StreamingSpec: 1h windows sliding 30min (2 per event). */
  def slidingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(d124(col("value"))).cast(DecimalType(38, 4)).as("sum_value"))

  private val qstreamSliding = QueryDef(
    "qstream_sliding",
    build = (spark, sfDir) =>
      slidingAgg(Tables.events(spark, sfDir))
        .select(col("window.start").cast(LongType).as("ws"), col("n"), decStr(col("sum_value")).as("sum_value"))
        .orderBy(col("ws")),
    oracle = Some(
      "WITH e AS (SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS b, " +
        "CAST(value AS DECIMAL(12,4)) AS v FROM events), " +
        "x AS (SELECT unnest([b, b - INTERVAL '30 minutes']) AS w, v FROM e) " +
        "SELECT CAST(epoch_us(w) // 1000000 AS BIGINT) AS ws, count(*) AS n, " +
        "CAST(CAST(sum(v) AS DECIMAL(38,4)) AS STRING) AS sum_value " +
        "FROM x GROUP BY w ORDER BY ws"))

  /** Shared with StreamingSpec: per-user 30-min-gap session windows. */
  def sessionAgg(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  private val qstreamSession = QueryDef(
    "qstream_session",
    build = (spark, sfDir) =>
      sessionAgg(Tables.events(spark, sfDir))
        .select(
          col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          col("n_events"),
          (unix_micros(col("session_window.end")) - unix_micros(col("session_window.start"))
            - lit(30L * 60 * 1000000)).as("dur_us"))
        .orderBy(col("user_id"), col("start_us")),
    oracle = Some(
      "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
        // strictly greater: Spark merges an event at exactly last+gap
        // (verified in StreamingSpec "session gap semantics")
        "g AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM g) " +
        "SELECT user_id, epoch_us(min(ts)) AS start_us, count(*) AS n_events, " +
        "epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, start_us"))

  /** Batch analogue of streaming dropDuplicatesWithinWatermark: exact dedup
    * on (user_id, event_type, ts) keeping min event_id (D8 — never an
    * arbitrary keeper). */
  private val qstreamDedup = QueryDef(
    "qstream_dedup",
    build = (spark, sfDir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"), col("ts"))
        .orderBy(col("event_id"))
      Tables.events(spark, sfDir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy(col("event_id"))
    },
    oracle = Some(
      "WITH d AS (SELECT event_id, user_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id, event_type, ts ORDER BY event_id) AS rn " +
        "FROM events) " +
        "SELECT event_id, user_id, event_type, ts_us FROM d WHERE rn = 1 ORDER BY event_id"))

  /** Per-user click→purchase funnel over a typed per-key scan — the
    * batch form of arbitrary-stateful streaming (flatMapGroupsWithState;
    * StreamingSpec runs [[FunnelState.update]] incrementally under
    * MemoryStream and asserts parity with this).
    *
    * For each user with at least one purchase: the first purchase
    * timestamp and the number of clicks STRICTLY before it (strict
    * inequality makes the result independent of same-timestamp ordering,
    * D8). groupByKey shuffles only the typed 4-field projection; the
    * per-user scan is O(events-per-user) with a sort of the group —
    * at 100 TB the same shape holds (hot users bound the group size;
    * a secondary-sort repartition variant drops the in-memory sort).
    */
  def funnel(spark: SparkSession, events: DataFrame): DataFrame = {
    val sp = spark
    import sp.implicits._
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val st = it.foldLeft(FunnelState.empty)(FunnelState.update)
        st.result(uid).iterator
      }
      .toDF()
  }

  private val qstreamFunnel = QueryDef(
    "qstream_funnel",
    build = (spark, sfDir) =>
      funnel(spark, Tables.events(spark, sfDir))
        .orderBy(col("user_id")),
    oracle = Some(
      "WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type " +
        "FROM events WHERE event_type IN ('click', 'purchase')), " +
        "p AS (SELECT user_id, min(us) AS fp FROM e WHERE event_type = 'purchase' GROUP BY user_id) " +
        "SELECT p.user_id, p.fp AS first_purchase_us, " +
        "count(CASE WHEN e.event_type = 'click' AND e.us < p.fp THEN 1 END) AS n_clicks_before " +
        "FROM p JOIN e ON e.user_id = p.user_id " +
        "GROUP BY p.user_id, p.fp ORDER BY p.user_id"))

  def defs: Seq[QueryDef] = Seq(
    qstreamTumbling, qstreamSliding, qstreamSession, qstreamDedup,
    qstreamFunnel)
}

/** Typed event row for [[StreamOps.funnel]] (top-level — Spark Encoders
  * cannot derive nested case classes). */
case class FunnelEvent(user_id: Long, ts_us: Long, event_type: String)

/** Funnel result row: users with ≥1 purchase only. */
case class FunnelResult(user_id: Long, first_purchase_us: Long, n_clicks_before: Long)

/** Order-insensitive funnel state — the SAME transition function serves
  * the batch fold (flatMapGroups) and incremental micro-batch updates
  * (flatMapGroupsWithState in StreamingSpec): min purchase timestamp plus
  * all click timestamps (clicks before an as-yet-unseen earlier purchase
  * cannot be discarded until the stream closes; a production deployment
  * bounds this with a watermark + state timeout).
  */
case class FunnelState(firstPurchaseUs: Option[Long], clickTs: Vector[Long]) {
  def result(uid: Long): Option[FunnelResult] =
    firstPurchaseUs.map(fp =>
      FunnelResult(uid, fp, clickTs.count(_ < fp).toLong))
}

object FunnelState {
  val empty: FunnelState = FunnelState(None, Vector.empty)

  def update(st: FunnelState, e: FunnelEvent): FunnelState =
    if (e.event_type == "purchase")
      st.copy(firstPurchaseUs = Some(st.firstPurchaseUs.fold(e.ts_us)(math.min(_, e.ts_us))))
    else st.copy(clickTs = st.clickTs :+ e.ts_us)
}
