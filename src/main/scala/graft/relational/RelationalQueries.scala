package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{AsOfJoin, GlobalOrder, RangeJoin}

/** The reference's relational operator surface (SURVEY.md §2) re-expressed on
  * the driver's TPC-H-ish tables, each with a DuckDB-equivalent oracle.
  *
  * Determinism rules (so Spark and DuckDB hash-match bit-for-bit):
  *   - money/quantity sums go through `centsSum` — per-row `round(x*100)` is
  *     IEEE-identical in both engines and the resulting integer-valued doubles
  *     sum exactly in any order (no float-order sensitivity);
  *   - every query ends in a total order (unique sort key);
  *   - output dtypes matched: Spark Int↔INTEGER, Long↔BIGINT, Double↔DOUBLE.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Order-independent exact sum of a 2-decimal money column, as cents. */
  private def centsSum(c: Column): Column = sum(round(c * 100)).cast("long")

  val queries: Map[String, Q] = Map(
    // A1: distribution count + pct (reference neighbor_analysis.py:138-153)
    "a1_distribution_count" -> { (s, d) =>
      import s.implicits._
      val counts = Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("cnt"))
      // total via a broadcast scalar join, not sum().over(Window.partitionBy())
      // — the empty-partition window funnels its input through one partition.
      // The two agg branches share one scan: Catalyst's ReuseExchange dedups
      // the identical partial-agg exchange.
      val total = counts.agg(sum($"cnt").as("total"))
      counts.crossJoin(broadcast(total))
        // floor-form 2dp rounding: pct is a rational (cnt/total), so
        // half-boundary ties are reachable and engine ROUNDs disagree on
        // them; floor(x*100 + 0.5)/100 is IEEE-identical in both engines
        .withColumn("pct", floor($"cnt" * 100.0 / $"total" * 100.0 + 0.5) / 100.0)
        .drop("total")
        .orderBy($"cnt".desc, $"l_returnflag")
    },

    // A2: cluster cardinality + member list (reference cluster_match.py:101-103)
    "a2_group_members" -> { (s, d) =>
      import s.implicits._
      Tables.nation(s, d)
        .groupBy($"n_regionkey")
        .agg(count(lit(1)).as("cnt"),
             array_join(sort_array(collect_list($"n_name")), ",").as("members"))
        .orderBy($"n_regionkey")
    },

    // A5: order-violation count (reference ncbi_database.py:104-110 —
    // intervals starting before the running max end).
    // l_shipdate in the window ORDER: the synthetic lineitem has
    // duplicate (l_orderkey, l_linenumber) pairs (~175 at sf0.1), so
    // without it the running max depends on engine-private tie order;
    // residual ties then have EQUAL shipdates, which provably cannot
    // change any row's violation verdict.
    "a5_order_violations" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_shipdate")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.lineitem(s, d)
        .withColumn("prev_max", max($"l_shipdate").over(w))
        .where($"prev_max".isNotNull && $"l_shipdate" < $"prev_max")
        .groupBy($"l_suppkey").agg(count(lit(1)).as("violations"))
        .orderBy($"l_suppkey")
    },

    // F1: semi-join filter (reference gene_location_analysis.py:32-37)
    "f1_semi_filter" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).where($"p_size" > 40),
              $"l_partkey" === $"p_partkey", "left_semi")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // F6: apply-expand projection (reference gentamycin.py:34-36)
    "f6_apply_expand" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d).select(
        $"o_orderkey",
        year($"o_orderdate").as("o_year"),
        month($"o_orderdate").as("o_month"),
        substring($"o_orderpriority", 1, 1).as("prio"),
        floor($"o_totalprice" / 1000).cast("long").as("price_kbucket"))
        .orderBy($"o_orderkey")
    },

    // J1 (scale path): custom interval-stab physical join (IEJoin family,
    // plans/IntervalStabJoin.scala) — range-partitioned sorted sweep, no
    // interval explosion, work proportional to true matches. The bucketed
    // RangeJoin.pointInInterval remains the strategy-free API variant.
    "j1_range_join" -> { (s, d) =>
      import s.implicits._
      val iv = Tables.orders(s, d)
        .select($"o_orderkey", $"o_orderkey".as("iv_start"), ($"o_orderkey" + 9L).as("iv_end"))
      val pts = Tables.lineitem(s, d).select($"l_orderkey", $"l_quantity")
      RangeJoin.pointInIntervalPlanned(pts, "l_orderkey", iv, "iv_start", "iv_end")
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_pts"), centsSum($"l_quantity").as("qty_cents"))
        .orderBy($"o_orderkey")
    },

    // J2: as-of join (reference neighbor_analysis.py:171-199 nearest-left)
    "j2_asof_join" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val purchases = ev.where($"event_type" === "purchase")
      val clicks = ev.where($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_event_id"))
      AsOfJoin.join(purchases, clicks, "user_id", "ts",
                    Seq("click_event_id"), "", "click_event_id")
        .select($"event_id", $"user_id", $"click_event_id")
        .orderBy($"event_id")
    },

    // J4: multi-way equi-join star query (reference name→segment joins,
    // ncbi_database.py:106-113) — the bench headline join.
    "j4_star_revenue" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_items"),
             centsSum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue_cents"))
        .orderBy($"r_name", $"n_name")
    },

    // J5: left-outer enrichment lookup (reference ecocyc_data_loader.py:36-40)
    "j5_left_outer" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
             coalesce(centsSum($"o_totalprice"), lit(0L)).as("spent_cents"))
        .orderBy($"c_custkey")
    },

    // J6: ordered index reorder join (reference location_reorder.py:18-45).
    // Numbering via GlobalOrder's two-phase distributed rank — a bare
    // row_number() window with no partition key would funnel the whole
    // table through ONE partition, the canonical 100× scale-killer.
    "j6_ordered_reorder" -> { (s, d) =>
      import s.implicits._
      val idx = GlobalOrder.withRowNumber(
          Tables.part(s, d).select($"p_partkey", $"p_name"),
          "ord64", $"p_name", $"p_partkey")
        .withColumn("ord", $"ord64".cast("int"))
      val sizes = Tables.lineitem(s, d)
        .groupBy($"l_partkey").agg(count(lit(1)).as("n_lines"))
      idx.join(sizes, $"p_partkey" === $"l_partkey", "left_outer")
        .select($"ord", $"p_partkey", coalesce($"n_lines", lit(0L)).as("n_lines"))
        .orderBy($"ord")
    },

    // J7: equality clustering via groupBy == exact dedup
    // (reference cluster_match.py:83-113 O(n²) loop → hash aggregation)
    "j7_dedup_exact" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"text")
        .agg(min($"doc_id").as("rep_doc_id"), count(lit(1)).as("n_dups"))
        .select($"rep_doc_id", $"n_dups", length($"text").as("text_len"))
        .orderBy($"rep_doc_id")
    },

    // T1 (relational form): top-k per group via the bounded top-k
    // AGGREGATE (reference gene_similarity_match.py:203-208 bounded heap,
    // re-expressed as graft.ops.BoundedTopK). l_returnflag has 3 values,
    // so a `row_number().over(Window.partitionBy(flag))` would funnel the
    // whole table through 3 partitions — the low-cardinality twin of the
    // j6 global-window scale-killer; the typed aggregate combines
    // map-side instead, shuffling ≤k slim rows per input partition per
    // flag. Same output, same deterministic order.
    "t1_topk_per_group" -> { (s, d) =>
      import s.implicits._
      val topK = new graft.ops.BoundedTopK[(Double, Long, Int)](
        3, Ordering.by(t => (-t._1, t._2, t._3)), implicitly)
      Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_extendedprice", $"l_orderkey", $"l_linenumber")
        .as[(String, Double, Long, Int)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3, t._4))
        .agg(topK.toColumn.name("top"))
        .flatMap { case (flag, top) =>
          top.zipWithIndex.map { case ((price, okey, lineno), i) =>
            (flag, i + 1, okey, lineno, price)
          }
        }
        .toDF("l_returnflag", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy($"l_returnflag", $"rn")
    },

    // T2: global sort + limit (reference gene_similarity_match.py:106)
    "t2_global_sort" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    },

    // W3: gap emission between consecutive ordered rows
    // (reference gene_range_analysis.py:24-39 inter-genic regions)
    "w3_gap_emission" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      Tables.lineitem(s, d)
        .withColumn("prev_date", lag($"l_shipdate", 1).over(w))
        .where($"prev_date".isNotNull)
        .select($"l_suppkey", datediff($"l_shipdate", $"prev_date").as("gap_days"))
        .groupBy($"l_suppkey")
        .agg(max($"gap_days").as("max_gap_days"), count(lit(1)).as("n_gaps"))
        .orderBy($"l_suppkey")
    },

    // G2-style generator: explode + count (reference explode patterns §2.8)
    "g2_explode_tokens" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("token"))
        .where($"token" =!= "")
        .groupBy($"token").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"token")
        .limit(20)
    },

    // Tumbling event-time windows over the events stream, batch form —
    // the SQL-checkable twin of StreamingOps.windowedCounts (1h windows).
    // Window id = epoch-µs timestamp div window length; Tables.events
    // already normalizes ts to an epoch-µs long (the precision DuckDB's
    // epoch_us(ts) shares), so both engines window on the same value.
    "ev_window" -> { (s, d) =>
      import s.implicits._
      val windowUs = 3600L * 1000000L
      Tables.events(s, d)
        .withColumn("window_start", expr(s"ts div $windowUs") * windowUs)
        .groupBy($"window_start", $"event_type")
        .agg(count(lit(1)).as("n_events"),
             countDistinct($"user_id").as("n_users"),
             centsSum($"value").as("value_cents"))
        .orderBy($"window_start", $"event_type")
    },

    // Gap-based sessionization over the events stream, batch form — the
    // SQL-checkable twin of StreamingOps.sessionize's
    // flatMapGroupsWithState (same boundary rule: a >6h silence starts a
    // new session). Per-user windows partition by user_id, so the state
    // never funnels through one task; value sums use the cents trick.
    "ev_sessionize" -> { (s, d) =>
      import s.implicits._
      // microsecond precision on BOTH engines: Tables.events normalizes ts
      // to an epoch-µs long, the exact value DuckDB's epoch_us(ts) yields,
      // so gap classification agrees bit-for-bit
      val gapUs = 6L * 3600 * 1000000L
      val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
      Tables.events(s, d)
        .withColumn("tsu", $"ts")
        .withColumn("prev_ts", lag($"tsu", 1).over(w))
        .withColumn("is_new",
          when($"prev_ts".isNull || $"tsu" - $"prev_ts" > gapUs, 1L).otherwise(0L))
        .withColumn("session_id", sum($"is_new").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(min($"tsu").as("session_start"), max($"tsu").as("session_end"),
             count(lit(1)).as("n_events"), centsSum($"value").as("value_cents"))
        .orderBy($"user_id", $"session_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "a1_distribution_count" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
         FLOOR(count(*) * 100.0 / SUM(count(*)) OVER () * 100.0 + 0.5) / 100.0 AS pct
         FROM lineitem GROUP BY l_returnflag ORDER BY cnt DESC, l_returnflag""",
    "a2_group_members" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS cnt,
         string_agg(n_name, ',' ORDER BY n_name) AS members
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "a5_order_violations" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS violations FROM (
           SELECT l_suppkey, l_shipdate,
                  MAX(l_shipdate) OVER (PARTITION BY l_suppkey
                    ORDER BY l_orderkey, l_linenumber, l_shipdate
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
           FROM lineitem) t
         WHERE prev_max IS NOT NULL AND l_shipdate < prev_max
         GROUP BY l_suppkey ORDER BY l_suppkey""",
    "f1_semi_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
         ORDER BY l_orderkey, l_linenumber""",
    "f6_apply_expand" ->
      """SELECT o_orderkey,
                CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
                CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS o_month,
                substr(o_orderpriority, 1, 1) AS prio,
                CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_kbucket
         FROM orders ORDER BY o_orderkey""",
    "j1_range_join" ->
      """SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_pts,
                CAST(SUM(ROUND(l_quantity * 100)) AS BIGINT) AS qty_cents
         FROM orders JOIN lineitem
           ON l_orderkey >= o_orderkey AND l_orderkey <= o_orderkey + 9
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    // as-of at epoch-µs precision on both engines (see the j3 oracle note:
    // a raw p.ts >= c.ts would compare at ns under a NANOS parquet layout
    // while Spark's Tables.events normalizes to µs). Deliberately NOT
    // DuckDB's ASOF JOIN (r11): ASOF picks an ARBITRARY right row when two
    // clicks share (user_id, tsu), while Spark's AsOfJoin deterministically
    // takes the greatest click_event_id — µs truncation makes such ties
    // reachable in a regenerated corpus, so the oracle pins the same
    // tie-break explicitly (the j3 ROW_NUMBER pattern: latest tsu, then
    // greatest event_id).
    "j2_asof_join" ->
      """SELECT event_id, user_id, click_event_id FROM (
           SELECT p.event_id AS event_id, p.user_id AS user_id,
                  c.event_id AS click_event_id,
                  ROW_NUMBER() OVER (PARTITION BY p.event_id
                                     ORDER BY c.tsu DESC, c.event_id DESC) AS rn
           FROM (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu
                 FROM events WHERE event_type = 'purchase') p
           LEFT JOIN (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu
                 FROM events WHERE event_type = 'click') c
             ON p.user_id = c.user_id AND p.tsu >= c.tsu
         ) WHERE rn = 1
         ORDER BY event_id""",
    "j4_star_revenue" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_items,
                CAST(SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT) AS revenue_cents
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "j5_left_outer" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
                CAST(COALESCE(SUM(ROUND(o_totalprice * 100)), 0) AS BIGINT) AS spent_cents
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "j6_ordered_reorder" ->
      """SELECT ord, p_partkey, CAST(COALESCE(n_lines, 0) AS BIGINT) AS n_lines
         FROM (SELECT p_partkey,
                      CAST(ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS INTEGER) AS ord
               FROM part) i
         LEFT JOIN (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines
                    FROM lineitem GROUP BY l_partkey) s
           ON p_partkey = l_partkey
         ORDER BY ord""",
    "j7_dedup_exact" ->
      """SELECT MIN(doc_id) AS rep_doc_id, CAST(count(*) AS BIGINT) AS n_dups,
                CAST(LENGTH(text) AS INTEGER) AS text_len
         FROM documents GROUP BY text ORDER BY rep_doc_id""",
    "t1_topk_per_group" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
           SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                  CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INTEGER) AS rn
           FROM lineitem) t
         WHERE rn <= 3 ORDER BY l_returnflag, rn""",
    "t2_global_sort" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "w3_gap_emission" ->
      """SELECT l_suppkey, CAST(MAX(gap_days) AS INTEGER) AS max_gap_days,
                CAST(count(*) AS BIGINT) AS n_gaps
         FROM (SELECT l_suppkey,
                      date_diff('day',
                        CAST(LAG(l_shipdate) OVER (PARTITION BY l_suppkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber) AS DATE),
                        CAST(l_shipdate AS DATE)) AS gap_days
               FROM lineitem) t
         WHERE gap_days IS NOT NULL
         GROUP BY l_suppkey ORDER BY l_suppkey""",
    "g2_explode_tokens" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents) t
         WHERE token <> '' GROUP BY token ORDER BY cnt DESC, token LIMIT 20""",
    "ev_window" ->
      """SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000) * 3600000000 AS window_start,
                event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(SUM(ROUND(value * 100)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "ev_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value,
                           CAST(epoch_us(ts) AS BIGINT) AS tsu FROM events),
         b AS (SELECT *, CASE WHEN LAG(tsu) OVER w IS NULL
                                OR tsu - LAG(tsu) OVER w > 21600000000
                              THEN 1 ELSE 0 END AS is_new
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                 ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS session_id
               FROM b)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                MIN(tsu) AS session_start, MAX(tsu) AS session_end,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(SUM(ROUND(value * 100)) AS BIGINT) AS value_cents
         FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"""
  )
}
