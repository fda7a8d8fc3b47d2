package graft.testqueries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Engine-completeness operators beyond the reference's surface
  * (SURVEY §2.3 notes the reference has only the inner equi-join; §2.7
  * none of the set ops): outer/semi/anti joins, rollup grouping sets,
  * general window functions, native listagg, scalar-subquery shape.
  */
object CompletenessQueries {
  import Tables._

  val all: Seq[QueryDef] = Seq(

    // Blocked edit-distance fuzzy join (entity resolution): pairs
    // within (mktsegment, nationkey) blocks at Levenshtein <= 1 —
    // threshold-filtered pair list (149 rows at sf0.01), exact within
    // blocks; the oracle replays the identical blocking + distance.
    QueryDef("q73_fuzzy_join",
      (s, d) => QueryDef.sorted1(
        graft.ops.FuzzyJoin.editDistanceJoin(customer(s, d),
          "c_custkey", "c_name", maxDist = 1,
          blockCols = Seq("c_mktsegment", "c_nationkey")),
        col("a_id"), col("b_id")),
      Some("""SELECT x.c_custkey AS a_id, y.c_custkey AS b_id,
        x.c_name AS a_val, y.c_name AS b_val,
        levenshtein(x.c_name, y.c_name) AS dist
        FROM customer x JOIN customer y
        ON x.c_mktsegment = y.c_mktsegment
          AND x.c_nationkey = y.c_nationkey
          AND x.c_custkey < y.c_custkey
          AND abs(length(x.c_name) - length(y.c_name)) <= 1
          AND levenshtein(x.c_name, y.c_name) <= 1
        ORDER BY a_id, b_id""")),

    // q73's aggregate consumer (the q109-for-q22 discipline applied to
    // entity resolution): per-id fuzzy-match COUNTS at distinct-string
    // granularity — rows out = ids, never pairs, so the output stays
    // corpus-sized while q73's pair list grows with duplication²
    // (7.5× for 3.3× data at the sf10 point). The oracle counts
    // directional partners from the enumerated pair list — affordable
    // at oracle scale, which is exactly the point of the split.
    QueryDef("q113_fuzzy_match_counts",
      (s, d) => QueryDef.sortedP(
        graft.ops.FuzzyJoin.editDistanceMatchCounts(customer(s, d),
          "c_custkey", "c_name", maxDist = 1,
          blockCols = Seq("c_mktsegment", "c_nationkey")),
        col("id")),
      Some("""WITH pairs AS (
        SELECT x.c_custkey AS a_id, y.c_custkey AS b_id
        FROM customer x JOIN customer y
        ON x.c_mktsegment = y.c_mktsegment
          AND x.c_nationkey = y.c_nationkey
          AND x.c_custkey <> y.c_custkey
          AND abs(length(x.c_name) - length(y.c_name)) <= 1
          AND levenshtein(x.c_name, y.c_name) <= 1),
      cnt AS (SELECT a_id AS id, COUNT(*) AS n FROM pairs GROUP BY a_id)
      SELECT c.c_custkey AS id, CAST(COALESCE(cnt.n, 0) AS BIGINT)
        AS n_matches
      FROM customer c LEFT JOIN cnt ON c.c_custkey = cnt.id
      ORDER BY id""")),

    // UNPIVOT / melt — the inverse of W1's pivot (wide measures →
    // (name, value) rows). Spark's native unpivot plans as Expand (a
    // narrow op: the early range partitioning on the id survives to the
    // tail sort — the q17 discipline for a 2x-corpus output).
    QueryDef("q72_unpivot",
      (s, d) => part(s, d)
        .repartitionByRange(col("p_partkey"))
        .select(col("p_partkey"),
          col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "val")
        .sortWithinPartitions("p_partkey", "metric"),
      Some("""SELECT p_partkey, metric, val FROM (
        UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size,
          p_retailprice FROM part)
        ON p_size, p_retailprice INTO NAME metric VALUE val)
        ORDER BY p_partkey, metric""")),

    // Left outer join with null-extension + conditional aggregation over
    // the null side.
    QueryDef("q32_outer_join",
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          Fns.sumDec(col("o_totalprice")).as("spend"),
          max(col("o_orderkey").isNull).as("has_no_orders"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend,
        bool_or(o_orderkey IS NULL) AS has_no_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // Semi + anti joins (EXISTS / NOT EXISTS shapes), tagged and unioned.
    QueryDef("q33_semi_anti_join",
      (s, d) => {
        val c = customer(s, d).select("c_custkey", "c_mktsegment")
        val o = orders(s, d).select("o_custkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .withColumn("src", lit("has_orders"))
          .unionByName(
            c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
              .withColumn("src", lit("no_orders")))
          .orderBy("c_custkey", "src")
      },
      Some("""SELECT c_custkey, c_mktsegment, 'has_orders' AS src
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
      UNION ALL
      SELECT c_custkey, c_mktsegment, 'no_orders' AS src
        FROM customer c
        WHERE NOT EXISTS
          (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
      ORDER BY c_custkey, src""")),

    // ROLLUP grouping sets with grouping indicators; sort keys made
    // non-null via the grouping flags + coalesce (Spark and DuckDB
    // disagree on default NULL sort order).
    QueryDef("q34_rollup",
      (s, d) => lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("n"),
          Fns.sumDec(col("l_quantity")).as("sum_qty"))
        .select(col("g_rf"), col("g_ls"),
          coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
          coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
          col("n"), col("sum_qty"))
        .transform(QueryDef.sorted1(_, col("g_rf"), col("g_ls"),
          col("rf"), col("ls"))),
      Some("""SELECT CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
        CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
        COALESCE(l_returnflag, '<all>') AS rf,
        COALESCE(l_linestatus, '<all>') AS ls,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_rf, g_ls, rf, ls""")),

    // General window functions: rank, dense_rank, lag, running sum per
    // customer over their orders (exact decimal running sum → double).
    QueryDef("q35_window_funcs",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        // corpus-proportional output: range-partition raw rows on the
        // leading sort key — RangePartitioning(o_custkey) satisfies the
        // window's ClusteredDistribution, so the window functions run
        // exchange-free and the (o_custkey, rnk, o_orderkey) total order
        // comes out of a parallel sortWithinPartitions
        orders(s, d).repartitionByRange(col("o_custkey")).select(
          col("o_custkey"), col("o_orderkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          lag("o_orderkey", 1).over(w).as("prev_order"),
          sum(col("o_totalprice").cast("decimal(28,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow))
            .cast("double").as("running_spend"))
          .sortWithinPartitions("o_custkey", "rnk", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        rank() OVER w AS rnk,
        dense_rank() OVER w AS drnk,
        lag(o_orderkey) OVER w AS prev_order,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, rnk, o_orderkey""")),

    // Spark 4.1 native listagg (SURVEY A2's preferred realization) —
    // WITHIN GROUP ordered, value tie-break for determinism.
    QueryDef("q36_listagg_native",
      (s, d) => lineitem(s, d)
        // range-partition raw rows by the grouping key (see q05): agg
        // runs exchange-free, total order comes out parallel
        .repartitionByRange(col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(expr("listagg(l_returnflag, ',') WITHIN GROUP " +
          "(ORDER BY l_linenumber, l_returnflag)").as("flags"))
        .sortWithinPartitions("l_orderkey"),
      Some("""SELECT l_orderkey,
        string_agg(l_returnflag, ',' ORDER BY l_linenumber, l_returnflag)
          AS flags
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // Scalar-subquery shape: orders above the global average price.
    // DataFrame side: broadcast cross join of the 1-row aggregate — the
    // plan Spark's own scalar-subquery rewrite produces.
    QueryDef("q37_scalar_subquery",
      (s, d) => {
        val avgPrice = orders(s, d)
          .agg((sum(col("o_totalprice").cast("decimal(28,2)"))
            .cast("double") / count(lit(1))).as("avg_price"))
        orders(s, d).join(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("avg_price") * 1.5)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice >
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
            AS DOUBLE) / COUNT(*) FROM orders) * CAST(1.5 AS DOUBLE)
        ORDER BY o_orderkey""")),

    // The native Catalyst GitBlobHashExpr (codegen'd custom Expression,
    // SURVEY §7 X7 upgrade path) through the same oracle as q15 — proves
    // the custom-expression path end-to-end, not just in unit tests.
    QueryDef("q38_git_blob_hash_native",
      (s, d) => {
        s.sessionState.functionRegistry.registerFunction(
          graft.plans.GitBlobHashExpr.identifier,
          graft.plans.GitBlobHashExpr.info,
          graft.plans.GitBlobHashExpr.builder)
        Tables.documents(s, d)
          .selectExpr("doc_id", "graft_git_blob_hash(text) AS code_hash")
          .orderBy("doc_id")
      },
      Some("""WITH n AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(
            regexp_replace(text, '\r\n?', chr(10), 'g'),
            '(?m)[ \t\x0b\f\x{1c}-\x{1f}\x{85}\x{a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+$',
            '', 'g'), '\n+$', '') AS t
        FROM documents)
      SELECT doc_id,
        sha256('blob ' || CAST(strlen(t) AS VARCHAR) || chr(0) || t)
          AS code_hash
      FROM n ORDER BY doc_id""")),

    // Range join (events within 5 minutes after each event), via the
    // bucket decomposition in ops/TemporalJoins — an equi-join on time
    // buckets, never a nested-loop cross product.
    //
    // The oracle ALSO uses the bucket decomposition (two hash-join arms
    // on b and b+1, exact-floor integer bucket arithmetic): DuckDB's
    // native inequality join cost ~19 min at sf1 even with the 3s gate
    // window — the entire two-scale gate wall — where the equi-join
    // form runs in seconds. Independence is preserved by (a) the
    // ground-truth predicate `r.us >= l.us AND r.us - l.us < w`
    // appearing verbatim as each arm's post-filter (buckets only
    // GENERATE candidates; completeness of {b, b+1} is one line:
    // l ∈ [bw,(b+1)w) ∧ r ∈ [l, l+w) ⇒ r ∈ [bw,(b+2)w)), and (b)
    // TemporalJoinsSpec checking the decomposition against a
    // no-bucket brute-force cross filter.
    QueryDef("q39_range_join",
      // per-event output: the bucket join clusters by time bucket, so the
      // count-per-event regroup needs its own exchange — let it be the
      // HASH exchange of the groupBy (partial agg combines map-side, so
      // only slim (event_id, count) rows shuffle, not raw pairs), then
      // order the SMALL agg output with sortedPMat. A repartitionByRange
      // directly on the join output samples its child and executes the
      // whole rangeJoin twice (the q53 trap).
      (s, d) => graft.ops.TemporalJoins
        .rangeJoin(events(s, d), events(s, d), "ts",
          GateKnobs.rangeWindowUs, "event_id", "event_id")
        .filter(col("l_id") =!= col("r_id"))
        .groupBy(col("l_id").as("event_id"))
        .agg(count(lit(1)).as("n_nearby"))
        .transform(QueryDef.sortedPMat(_, col("event_id"))),
      Some {
        val w = GateKnobs.rangeWindowUs
        s"""WITH b AS (
          SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
            (epoch_us(CAST(ts AS TIMESTAMP))
              - ((epoch_us(CAST(ts AS TIMESTAMP)) % $w + $w) % $w))
              // $w AS b
          FROM events),
        p AS (
          SELECT l.event_id AS l_id
          FROM b l JOIN b r ON r.b = l.b
            AND r.us >= l.us AND r.us - l.us < $w
            AND r.event_id <> l.event_id
          UNION ALL
          SELECT l.event_id
          FROM b l JOIN b r ON r.b = l.b + 1
            AND r.us >= l.us AND r.us - l.us < $w
            AND r.event_id <> l.event_id)
        SELECT l_id AS event_id, COUNT(*) AS n_nearby
        FROM p GROUP BY l_id ORDER BY event_id"""
      }),

    // Aggregate range count — the scale path when only counts are
    // needed: pair enumeration is quadratic in event density (~100x
    // pairs for 10x density, measured on the sf1 gate), while the
    // sweep is O((|L|+|R|) log bucket) regardless of pair count. Same
    // window as q39 but self-inclusive (count of all events in
    // [t, t+5min), including the probe event itself).
    QueryDef("q76_range_count",
      (s, d) => graft.ops.TemporalJoins
        .rangeCount(events(s, d), events(s, d), "ts",
          GateKnobs.rangeWindowUs, "event_id")
        .select(col("l_id").as("event_id"), col("n").as("n_window"))
        .transform(QueryDef.sortedPMat(_, col("event_id"))),
      // Oracle: same bucketed equi-join rewrite (and rationale) as q39,
      // self-inclusive — no id-inequality filter.
      Some {
        val w = GateKnobs.rangeWindowUs
        s"""WITH b AS (
          SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
            (epoch_us(CAST(ts AS TIMESTAMP))
              - ((epoch_us(CAST(ts AS TIMESTAMP)) % $w + $w) % $w))
              // $w AS b
          FROM events),
        p AS (
          SELECT l.event_id AS l_id
          FROM b l JOIN b r ON r.b = l.b
            AND r.us >= l.us AND r.us - l.us < $w
          UNION ALL
          SELECT l.event_id
          FROM b l JOIN b r ON r.b = l.b + 1
            AND r.us >= l.us AND r.us - l.us < $w)
        SELECT l_id AS event_id, COUNT(*) AS n_window
        FROM p GROUP BY l_id ORDER BY event_id"""
      }),

    // As-of join: each order matched to the user's latest event at or
    // before the order date (union-window realization — one shuffle on
    // the key). Oracle mirrors the same window construction.
    QueryDef("q40_asof_join",
      (s, d) => {
        val o = orders(s, d)
          .select(col("o_orderkey"), (col("o_custkey") % 50).as("user_id"),
            col("o_orderdate"))
        graft.ops.TemporalJoins.asOfJoin(
            o.withColumnRenamed("o_orderdate", "ts"),
            events(s, d), "user_id", "ts", "o_orderkey", "event_id")
          .select(col("l_id").as("o_orderkey"),
            col("matched").as("last_event_id"))
          // one matched row per order: parallel range sort in tail
          // position (the as-of union-window clusters by user_id, which
          // the o_orderkey order can't reuse)
          .transform(QueryDef.sortedP(_, col("o_orderkey")))
      },
      Some("""WITH u AS (
        SELECT o_custkey % 50 AS k, o_orderdate AS t, 1 AS is_left,
          CAST(NULL AS BIGINT) AS r_id, o_orderkey AS l_id
        FROM orders
        UNION ALL
        SELECT user_id, CAST(ts AS TIMESTAMP), 0, event_id,
          CAST(NULL AS BIGINT)
        FROM events),
      w AS (
        SELECT l_id, is_left,
          last_value(r_id IGNORE NULLS) OVER (PARTITION BY k
            ORDER BY t, is_left, COALESCE(r_id, l_id)
            ROWS UNBOUNDED PRECEDING) AS matched
        FROM u)
      SELECT l_id AS o_orderkey, matched AS last_event_id
      FROM w WHERE is_left = 1 ORDER BY o_orderkey""")),

    // Window-function breadth beyond q35: lead, row_number, ntile,
    // percent_rank, first/last value with explicit frames. The window
    // order (o_orderdate, o_orderkey) is total (o_orderkey unique), so
    // every function is deterministic in both engines.
    QueryDef("q54_window_breadth",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        // range-partition raw rows on the leading sort key (see q35)
        orders(s, d).repartitionByRange(col("o_custkey")).select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          lead("o_orderkey", 1).over(w).as("next_order"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prank"),
          first_value(col("o_orderkey")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("first_order"),
          last_value(col("o_orderkey")).over(
            w.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("last_order"))
          .sortWithinPartitions("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey,
        row_number() OVER w AS rn,
        lead(o_orderkey) OVER w AS next_order,
        ntile(4) OVER w AS quartile,
        percent_rank() OVER w AS prank,
        first_value(o_orderkey) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order,
        last_value(o_orderkey) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS last_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, rn""")),

    // Explicit GROUPING SETS (beyond q34 ROLLUP / q44 CUBE): an
    // arbitrary, non-hierarchical set list through the SQL surface,
    // grouping() flags exposed, NULL keys coalesced before the sort
    // (Spark NULLS FIRST vs DuckDB NULLS LAST would otherwise flip
    // row order).
    QueryDef("q55_grouping_sets",
      // Re-agg decomposition (ops/Rollups): the native GROUPING SETS
      // plan Expands every lineitem row x3 before the hash aggregate
      // (measured ~2.5x the plain 2-key agg at sf0.1); here the fact
      // table is aggregated ONCE and the 3 sets re-aggregate the tiny
      // (rf x ls) partial frame. Bit parity with the built-in operator
      // is RollupsSpec's job; the oracle checks semantics as usual.
      (s, d) => graft.ops.Rollups.groupingSetsReAgg(
          lineitem(s, d),
          keys = Seq("l_returnflag", "l_linestatus"),
          baseAggs = Seq(count(lit(1)).as("pn"),
            sum(col("l_quantity").cast("decimal(28,2)")).as("pq")),
          reAggs = Seq(sum(col("pn")).as("n"),
            sum(col("pq")).cast("double").as("sum_qty")),
          sets = Seq(Seq("l_returnflag", "l_linestatus"),
            Seq("l_linestatus"), Seq.empty))
        .select(col("grouping_l_returnflag").as("g_rf"),
          col("grouping_l_linestatus").as("g_ls"),
          coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
          coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("g_rf", "g_ls", "rf", "ls"),
      Some("""SELECT CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
        CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
        COALESCE(l_returnflag, '<all>') AS rf,
        COALESCE(l_linestatus, '<all>') AS ls,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        (l_linestatus), ())
      ORDER BY g_rf, g_ls, rf, ls"""))
  )
}
