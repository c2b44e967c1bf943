package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.core._
import graft.functions.TextFunctions
import QueryDef._

/** SURVEY §2.1–§2.8 backend query-operator inventory: scans, id/prefix/range
  * lookups, condition trees, aggregation pushdown, adjacency-shaped joins,
  * semi/anti joins, order/offset/limit, set ops, dedup, degree-cap windows,
  * text predicates, scalar functions, merge-on-write aggregate properties.
  *
  * Each entry is deliberately declarative DataFrame code — the predicate and
  * projection land in the parquet scan (PushedFilters/ReadSchema) and the
  * whole stage stays in codegen; there is nothing to hand-optimize at 100 TB
  * beyond join strategy, which is annotated per query.
  */
object RelationalQueries {
  private val dec = DecimalType(18, 2)

  val defs: Seq[QueryDef] = Seq(

    // --- scans + condition trees (Query/ConditionQuery, SURVEY §2.1-2.2) ---
    q("q_scan_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'""".stripMargin) { (s, d) =>
      // revenue is computed in exact decimal arithmetic (inputs have 2
      // decimal digits) — double products can land on .xx5 midpoints that
      // engines round differently.
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
            .cast("double").as("revenue"),
          col("l_returnflag"))
    },

    q("q_id_lookup",
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |WHERE o_orderkey IN (1, 7, 42, 500, 999, 123456789)""".stripMargin) { (s, d) =>
      // IdQuery: point-get by id set (reference IdQuery.java) — a pushed-down
      // IN filter on the scan, no shuffle.
      Tables.orders(s, d)
        .filter(col("o_orderkey").isin(1L, 7L, 42L, 500L, 999L, 123456789L))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
    },

    q("q_prefix_scan",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem WHERE l_orderkey = 42""".stripMargin) { (s, d) =>
      // IdPrefixQuery: all edge rows of one owner vertex — partition-prunable
      // when the table is clustered by the owner key.
      Tables.lineitem(s, d).filter(col("l_orderkey") === 42L)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
    },

    q("q_range_scan",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey >= 100 AND o_orderkey < 200""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") >= 100L && col("o_orderkey") < 200L)
        .select(col("o_orderkey"), col("o_totalprice"))
    },

    q("q_shard_enumeration", {
      // shard enumeration (reference backend/store/Shard.java (start, end,
      // length) token-range slices): the md5-derived 16-bit token space
      // split into 8 equal ranges over customer vertex ids — the
      // IdRangeQuery/SCAN-token surface a parallel scanner consumes
      def d4(i: Int) =
        s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
      s"""WITH ids AS (SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS id,
         |                    md5('customer:' || CAST(c_custkey AS VARCHAR)) AS h
         |             FROM customer),
         |t AS (SELECT id, (${d4(1)} * 4096 + ${d4(2)} * 256 + ${d4(3)} * 16 + ${d4(4)})
         |               // 8192 AS shard FROM ids)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |       CAST(shard * 8192 AS BIGINT) AS start,
         |       CAST((shard + 1) * 8192 - 1 AS BIGINT) AS "end",
         |       CAST(count(*) AS BIGINT) AS length,
         |       min(id) AS min_id, max(id) AS max_id
         |FROM t GROUP BY shard""".stripMargin
    }) { (s, d) =>
      graft.sources.GraphStore.shardSplits(
        Tables.customer(s, d).select(
          concat(lit("customer:"), col("c_custkey").cast("string")).as("id")),
        "id", nShards = 8)
    },

    q("q_condition_dnf",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE (l_returnflag = 'A' AND l_quantity < 5)
        |   OR (l_returnflag = 'R' AND l_discount > 0.08)
        |   OR l_partkey IN (1, 2, 3)""".stripMargin) { (s, d) =>
      // The reference DNF-flattens this into unioned sub-queries
      // (ConditionQueryFlatten.flatten); Catalyst evaluates the boolean tree
      // directly on the scan. Built with our Cond algebra to exercise the
      // Condition → Column compiler.
      val cond = (Cond.eq("l_returnflag", "A") and Cond.lt("l_quantity", 5))
        .or(Cond.eq("l_returnflag", "R") and Cond.gt("l_discount", 0.08))
        .or(Cond.in("l_partkey", Seq(1L, 2L, 3L)))
      Tables.lineitem(s, d).filter(cond.compile)
        .select(col("l_orderkey"), col("l_linenumber"))
    },

    // ------------------- aggregation (SURVEY §2.4) -------------------------
    q("q_agg_sum",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        |       CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
      bench = true) { (s, d) =>
      // Partial aggregation is map-side (HashAggregate partial/final) — the
      // shuffle carries one row per (flag,status) per partition, not data.
      Tables.lineitem(s, d).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          round(sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    q("q_count_pushdown",
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-09-01'") { (s, d) =>
      // HugeCountStepStrategy analogue: scan+count collapses; Spark answers
      // from parquet row-group stats + pushed filter.
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1995-09-01").cast("timestamp"))
        .agg(count(lit(1)).as("n"))
    },

    q("q_agg_minmax",
      """SELECT min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).agg(
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"),
        countDistinct(col("o_custkey")).as("n_cust"))
    },

    q("q_agg_prop_merge",
      """SELECT l_orderkey,
        |       max(l_quantity) AS max_qty,
        |       min(l_quantity) AS min_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       substr(min(lpad(CAST(l_linenumber AS VARCHAR), 3, '0') || l_returnflag), 4) AS old_flag,
        |       array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS set_flags,
        |       array_to_string(list_sort(list(l_linenumber)), ',') AS list_lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin) { (s, d) =>
      // Merge-on-write aggregate properties (AggregateType MAX/MIN/SUM/OLD/
      // SET/LIST, reference HugeProperty.java:84): re-writing a property
      // combines with the stored value; in a columnar engine the merge is the
      // ingest-time groupBy — OLD = value of the first write (min sort key).
      Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(
          max(col("l_quantity")).as("max_qty"),
          min(col("l_quantity")).as("min_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_price"),
          // OLD = first-written value; first = min (sort key, value) pair so
          // duplicate linenumbers can't tie-break differently across engines
          substring(min(concat(lpad(col("l_linenumber").cast("string"), 3, "0"),
            col("l_returnflag"))), 4, 100).as("old_flag"),
          // serialize SET/LIST merges to csv: the driver's comparator sorts
          // scalar columns only, and the string form is engine-portable
          concat_ws(",", array_sort(collect_set(col("l_returnflag")))).as("set_flags"),
          concat_ws(",", array_sort(collect_list(col("l_linenumber")))).as("list_lines"))
    },

    // ---------------------- joins (SURVEY §2.3) ----------------------------
    q("q_join_adjacency",
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin,
      bench = true) { (s, d) =>
      // THE core graph "join": frontier ⋈ edges. The filtered customer side
      // is small → broadcast; at 1000 executors this is a map-side join with
      // zero shuffle of the big orders table.
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      Tables.orders(s, d).join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    },

    q("q_join_multihop",
      """SELECT p.p_brand,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE c.c_mktsegment = 'AUTOMOBILE'
        |GROUP BY p.p_brand""".stripMargin,
      bench = true) { (s, d) =>
      // 3-hop traversal as chained joins; dims (customer-filtered, part) are
      // broadcast so only lineitem⋈orders shuffles — and AQE may convert
      // even that to broadcast at small SF.
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    q("q_semi_join",
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
    },

    // anti-join against the FILTERED order set (every sf0.01 customer has
    // some order, so the unfiltered variant proved emptiness only —
    // customers without a single >400k order survive and gate real rows)
    q("q_anti_join",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
    },

    // ------------- sort / limit / offset (SURVEY §2.6) ---------------------
    q("q_order_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20 OFFSET 5""".stripMargin) { (s, d) =>
      // TopK never globally sorts: Spark plans TakeOrderedAndProject —
      // per-partition heap + driver merge of 25 rows. o_orderkey tiebreak
      // keeps the cut deterministic across engines.
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(5).limit(20)
        .select(col("o_orderkey"), col("o_totalprice"))
    },

    // --------------------- set ops / dedup (SURVEY §2.7) -------------------
    // salted join (SURVEY §4.2 super-node/skew): result must be identical
    // to the plain join — the salt only spreads a hot key over `salts`
    // reducers; verified against the unsalted SQL join
    q("q_salted_join",
      """SELECT o.o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey < 1000
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k"), col("l_quantity").cast(dec).as("q"))
      val small = Tables.orders(s, d).filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      graft.ops.Skew.saltedJoin(big, small, "k", salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("q")).cast("double").as("total_qty"))
    },

    // two-phase (salted) aggregation for skewed group keys — partial per
    // (key, salt), final per key; decimal sums keep both phases exact so
    // the result is bit-equal to the single-phase oracle
    q("q_skew_agg",
      """SELECT l_returnflag AS key,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
      graft.ops.Skew.skewSafeCountSum(
          Tables.lineitem(s, d)
            .select(col("l_returnflag").as("key"), col("l_quantity").cast(dec).as("q")),
          "key", "q", salts = 8)
        .select(col("key"), col("n"), col("total").cast("double").as("total"))
    },

    q("q_setops",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 0
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_nationkey = 3""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        .intersect(c.filter(col("c_acctbal") > 0).select(col("c_custkey")))
        .except(c.filter(col("c_nationkey") === 3).select(col("c_custkey")))
    },

    q("q_dedup",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, d) =>
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct()
    },

    // ------------------ windows: degree cap (SURVEY §2.5) ------------------
    q("q_window_degree_cap",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_orderdate DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin) { (s, d) =>
      // Per-vertex degree cap (HugeTraverser.edgesOfVertex truncation) as a
      // deterministic window — the one Window.partitionBy needed for parity.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    },

    q("q_window_running",
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_total
        |FROM orders""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_total", sum(col("o_totalprice").cast(dec)).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
    },

    // ------------------- text predicates (SURVEY §2.2/2.8) -----------------
    q("q_text_contains",
      """SELECT p_partkey, p_name FROM part
        |WHERE list_contains(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> len(t) > 0), 'widget')""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(TextFunctions.textContains(col("p_name"), "widget"))
        .select(col("p_partkey"), col("p_name"))
    },

    q("q_text_contains_any",
      """SELECT p_partkey FROM part
        |WHERE len(list_intersect(list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> len(t) > 0),
        |                         ['bolt', 'nut'])) > 0""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(TextFunctions.textContainsAny(col("p_name"), Seq("bolt", "nut")))
        .select(col("p_partkey"))
    },

    // ---------------------- scalar functions (SURVEY §2.8) -----------------
    q("q_scalar_funcs",
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m') AS ym,
        |       substr(o_orderpriority, 1, 1) AS prio,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)) AS DOUBLE) AS taxed,
        |       'order:' || CAST(o_orderkey AS VARCHAR) AS oid
        |FROM orders WHERE o_orderkey < 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 100L)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          substring(col("o_orderpriority"), 1, 1).as("prio"),
          (col("o_totalprice").cast(dec) * lit(BigDecimal("1.1")).cast(DecimalType(3, 1)))
            .cast("double").as("taxed"),
          concat(lit("order:"), col("o_orderkey").cast("string")).as("oid"))
    },

    q("q_json_extract",
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events WHERE event_type = 'purchase'""".stripMargin) { (s, d) =>
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
    },

    q("q_props_map",
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE json_extract(props, '$.k') IS NOT NULL
        |  AND CAST(json_extract(props, '$.k') AS BIGINT) BETWEEN 40 AND 60""".stripMargin) { (s, d) =>
      // CONTAINS_KEY / map-value predicates over a typed property map
      // (reference ConditionQuery CONTAINS_KEY/CONTAINS semantics,
      // `backend/query/Condition.java` relations) — props parsed ONCE into
      // a real MapType column, then native map functions; the JSON parse +
      // map predicates all stay in whole-stage codegen.
      import org.apache.spark.sql.types.{LongType, MapType, StringType}
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), MapType(StringType, LongType)).as("m"))
        .filter(map_contains_key(col("m"), "k") &&
          element_at(col("m"), "k").between(40, 60))
        .select(col("event_id"), element_at(col("m"), "k").as("k"))
    },

    q("q_quantile_sketch", {
      def hex4(expr: String) = (0 until 4).map { j =>
        val mult = math.pow(16, 3 - j).toLong
        s"(strpos('0123456789abcdef', substr(md5($expr), ${j + 1}, 1)) - 1) * $mult"
      }.mkString("(", " + ", ")")
      val pred = hex4("CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")
      def block(p: Double) =
        s"""SELECT CAST($p AS DOUBLE) AS p, max(v) AS v FROM r
           |WHERE rn <= CAST(ceil($p * n) AS BIGINT)""".stripMargin
      s"""WITH s AS (SELECT l_extendedprice AS v FROM lineitem WHERE $pred < 6554),
         |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n FROM s)
         |${Seq(0.5, 0.9, 0.99).map(block).mkString("\nUNION ALL\n")}""".stripMargin
    }) { (s, d) =>
      // Quantile estimation by DETERMINISTIC sampling: the md5-uniform
      // ~10% sample (the Packing.mixSample hash family) replaces a
      // reservoir, so the sketch — unlike percentile_approx's GK digest —
      // is exactly reproducible by the oracle. Quantile = type-1 (element
      // at ceil(p·n), no interpolation): Spark computes it as a
      // TakeOrderedAndProject top-k + max — k rows per partition, never a
      // global sort — after ONE bounded count of the sample.
      val pred = conv(substring(md5(concat(
          col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))), 1, 4), 16, 10)
        .cast("int") < 6554
      val sample = graft.core.Pin.pinDerived(
        Tables.lineitem(s, d).filter(pred).select(col("l_extendedprice").as("v")))
      val n = sample.count()
      Seq(0.5, 0.9, 0.99).map { p =>
        val k = math.max(1L, math.ceil(p * n).toLong).toInt
        sample.orderBy(col("v").asc).limit(k)
          .agg(max(col("v")).as("v"))
          .select(lit(p).as("p"), col("v"))
      }.reduce(_ unionByName _)
    },

    q("q_graph_variables",
      // §2.14 graph-variables KV (reference HugeVariables.java:109-391):
      // seed from per-region nation counts, then set (insert + last-write-
      // wins overwrite) and remove — the surviving KV table is the oracle
      """SELECT 'job:last_run' AS key, '2026-08-14' AS value
        |UNION ALL
        |SELECT 'region:' || r_name, CAST(cnt AS VARCHAR)
        |FROM (SELECT r_name, count(*) AS cnt
        |      FROM region JOIN nation ON n_regionkey = r_regionkey
        |      GROUP BY r_name) z
        |WHERE r_name <> 'AFRICA'""".stripMargin) { (s, d) =>
      import graft.core.Variables
      var vars = Tables.region(s, d)
        .join(Tables.nation(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("cnt"))
        .select(concat(lit("region:"), col("r_name")).as("key"),
          col("cnt").cast("string").as("value"))
      vars = Variables.set(vars, "job:last_run", "2026-08-13")
      vars = Variables.set(vars, "job:last_run", "2026-08-14") // overwrite
      vars = Variables.remove(vars, "region:AFRICA")
      vars
    },

    q("q_rollup_agg",
      // hierarchical subtotals in ONE aggregation pass (the engine surface
      // the reference's coarse per-label counts lack): ROLLUP emits
      // (flag, status) → (flag) → grand total with GROUPING markers
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS lvl,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg((grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("lvl"),
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("lvl"),
          col("sum_qty"), col("n"))
    },

    q("q_pivot_counts",
      // pivoted (nation × market segment) customer counts — conditional
      // aggregation in the oracle, Spark's relational pivot on the engine
      // side; one groupBy pass either way
      """SELECT c_nationkey,
        |  CAST(count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS BIGINT) AS automobile,
        |  CAST(count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS BIGINT) AS building,
        |  CAST(count(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS BIGINT) AS machinery
        |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .pivot("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "MACHINERY"))
        .count()
        .select(col("c_nationkey"),
          coalesce(col("AUTOMOBILE"), lit(0L)).as("automobile"),
          coalesce(col("BUILDING"), lit(0L)).as("building"),
          coalesce(col("MACHINERY"), lit(0L)).as("machinery"))
    })
}
