package graft.relational

/** DuckDB oracles for [[RelationalQueries]] — aliases match the Spark
  * column names exactly; integer sums cast back to BIGINT (DuckDB SUM(int)
  * is HUGEINT); order-dependent double aggregates rounded identically. */
object RelationalOracles {

  private def profileCol(c: String, numeric: Boolean): String = {
    val mn = if (numeric) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    val mx = if (numeric) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
       |       COUNT(*) - COUNT($c) AS n_nulls,
       |       COUNT(DISTINCT $c) AS n_distinct,
       |       $mn AS min_num, $mx AS max_num FROM orders""".stripMargin
  }

  /** Sorted-char-multiset block key; chars iterated via range + substr
    * (the validated cross-engine char loop), sorted ascending — ASCII
    * names, so Spark's array_sort and DuckDB's list_sort agree. */
  private def sortedChars(s: String): String =
    s"array_to_string(list_sort(list_transform(range(1, length($s) + 1), " +
      s"i -> substr($s, CAST(i AS INT), 1))), '')"

  private val corruptedName: String =
    "concat(substr(c_name, 1, length(c_name) - 2), " +
      "substr(c_name, length(c_name), 1), " +
      "substr(c_name, length(c_name) - 1, 1))"

  private val mortonSql: String = {
    val terms = (0 until 8).flatMap { b =>
      Seq(s"(((bx >> $b) & 1) << ${2 * b})", s"(((bz >> $b) & 1) << ${2 * b + 1})")
    }
    terms.mkString(" + ")
  }

  private def fkAuditSql(child: String, fk: String, parent: String, pk: String,
      name: String): String =
    s"""SELECT '$name' AS relation,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child) AS n_child_rows,
       |  (SELECT CAST(COUNT(DISTINCT $fk) AS BIGINT) FROM $child) AS n_distinct_fk,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $parent) AS n_parents,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child
       |   WHERE $fk NOT IN (SELECT $pk FROM $parent)) AS n_orphan_rows,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $parent
       |   WHERE $pk NOT IN (SELECT $fk FROM $child)) AS n_childless_parents,
       |  (SELECT CAST(MAX(c) AS BIGINT) FROM
       |    (SELECT COUNT(*) AS c FROM $child GROUP BY $fk)) AS max_fanout""".stripMargin

  val all: Map[String, String] = Map(
    // semi-additive: per-user daily close, LOCF over the snapshot grid,
    // DECIMAL-exact cross-user sum per day
    "rel_semi_additive" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id,
        |             CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |daily AS (SELECT user_id, d, v FROM (
        |  SELECT user_id, d, v, row_number() OVER (
        |    PARTITION BY user_id, d ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM e) WHERE rn = 1),
        |spine AS (SELECT DISTINCT d FROM daily),
        |grid AS (SELECT u.user_id, s.d
        |         FROM (SELECT DISTINCT user_id FROM daily) u
        |         CROSS JOIN spine s),
        |filled AS (SELECT g.user_id, g.d,
        |             last_value(dd.v IGNORE NULLS) OVER (
        |               PARTITION BY g.user_id ORDER BY g.d
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
        |           FROM grid g LEFT JOIN daily dd
        |             ON dd.user_id = g.user_id AND dd.d = g.d)
        |SELECT CAST(d AS VARCHAR) AS day,
        |       CAST(COUNT(*) AS BIGINT) AS n_accounts,
        |       CAST(CAST(SUM(bal) AS DECIMAL(18,2)) AS DOUBLE) AS total_balance
        |FROM filled WHERE bal IS NOT NULL
        |GROUP BY d ORDER BY day""".stripMargin,
    // retraction merge ≡ recompute over the FINAL state (base ∖ deletes ∪ inserts)
    "rel_incremental_agg_retract" ->
      """WITH fin AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
        |  WHERE NOT (event_id % 10 <> 0 AND event_id % 20 = 3))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(CAST(SUM(v) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value,
        |       ROUND(CAST(CAST(SUM(v) AS DECIMAL(18,2)) AS DOUBLE)
        |             / CAST(COUNT(*) AS BIGINT), 6) AS avg_value
        |FROM fin GROUP BY event_type ORDER BY event_type""".stripMargin,
    // GDPR cascade audit; n_orphan_survivors must hash as 0
    "rel_delete_propagation" ->
      """WITH req AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |dead_o AS (SELECT o_orderkey FROM orders
        |           WHERE o_custkey IN (SELECT c_custkey FROM req))
        |SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM req) AS n_requests,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM dead_o) AS n_orders_deleted,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |   WHERE l_orderkey IN (SELECT o_orderkey FROM dead_o))
        |    AS n_lineitems_deleted,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM req)) AS n_orders_kept,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM dead_o))
        |    AS n_lineitems_kept,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM req)
        |     AND o_custkey IN (SELECT c_custkey FROM req))
        |    AS n_orphan_survivors""".stripMargin,
    // the two-phase bucketed numbering must equal this global definition
    "rel_global_ids" ->
      """SELECT l_orderkey, l_linenumber,
        |       row_number() OVER (ORDER BY l_orderkey, l_linenumber)
        |         AS global_id
        |FROM lineitem""".stripMargin,
    // ORC roundtrip binds to the DIRECT path (lossless landing required)
    "rel_orc_roundtrip" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date
        |FROM orders WHERE o_orderstatus <> 'P'
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // CMS: identical depth-3 hashed counters, min-probe estimate
    "rel_cms_estimate" -> {
      def b(d: Int) =
        s"(${graft.functions.TextHashSql.strHash(s"'cms$d:' || CAST(user_id AS VARCHAR)")} % 64)"
      val cms = (0 until 3).map(d =>
        s"SELECT $d AS depth, ${b(d)} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt " +
          s"FROM events GROUP BY 2").mkString("\nUNION ALL\n")
      val probes = (0 until 3).map(d =>
        s"SELECT user_id, true_cnt, $d AS depth, ${b(d)} AS bucket FROM keys")
        .mkString("\nUNION ALL\n")
      s"""WITH cms AS ($cms),
         |keys AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
         |         FROM events GROUP BY 1),
         |probes AS ($probes),
         |est AS (SELECT user_id, true_cnt, MIN(cnt) AS cms_est
         |        FROM probes JOIN cms USING (depth, bucket) GROUP BY 1, 2)
         |SELECT user_id, true_cnt, cms_est, cms_est - true_cnt AS overcount
         |FROM est ORDER BY true_cnt DESC, user_id LIMIT 10""".stripMargin
    },
    // exact integer gradient; identical lr arithmetic at the edge
    "rel_hash_features_lr" -> {
      val h = graft.functions.TextHashSql.strHash("'feat:' || token")
      s"""WITH tok AS (SELECT CASE WHEN source = '${graft.text.TextAnalysis.DsirTarget}'
         |               THEN 1 ELSE 0 END AS y,
         |             unnest(${graft.functions.TextHashSql.tokens("text")}) AS token
         |      FROM documents),
         |g AS (SELECT ($h % 64) AS feature,
         |        CAST(COUNT(*) AS BIGINT) AS n_total,
         |        CAST(SUM(y) AS BIGINT) AS n_pos
         |      FROM tok GROUP BY 1)
         |SELECT feature, n_total, n_pos,
         |       2 * n_pos - n_total AS grad_x2,
         |       round(0.1 * CAST(2 * n_pos - n_total AS DOUBLE) / 2, 6) AS w_step
         |FROM g ORDER BY feature""".stripMargin
    },
    // reproducible Laplace release: identical inverse-CDF arithmetic on the
    // hash-uniform draw, round 4
    "rel_dp_noise" -> {
      val h = graft.functions.TextHashSql.strHash("'dp:' || o_orderpriority")
      val p = graft.functions.TextHash.P
      s"""WITH g AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
         |           FROM orders GROUP BY 1),
         |u AS (SELECT *, CAST($h AS DOUBLE) / $p.0 - 0.5 AS u FROM g),
         |z AS (SELECT o_orderpriority, n,
         |        round(CASE WHEN u < 0 THEN 1.0 ELSE -1.0 END
         |              * ln(1 - 2 * abs(u)) / 1.0, 4) AS noise
         |      FROM u)
         |SELECT o_orderpriority, n, noise, round(n + noise, 4) AS released
         |FROM z ORDER BY o_orderpriority""".stripMargin
    },
    // zone-map audit: same 1024-row file simulation on both layouts
    "rel_minmax_prune" -> {
      def audit(layout: String, fileExpr: String, src: String) =
        s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
           |  CAST(SUM(CASE WHEN cls = 'skipped' THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
           |  CAST(SUM(CASE WHEN cls = 'full' THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
           |  CAST(SUM(CASE WHEN cls <> 'skipped' THEN rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           |  CAST(SUM(matched) AS BIGINT) AS rows_matched,
           |  '$layout' AS layout
           |FROM (
           |  SELECT file_id, MIN(o_orderdate) AS f_min, MAX(o_orderdate) AS f_max,
           |         CAST(COUNT(*) AS BIGINT) AS rows,
           |         CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
           |                        AND o_orderdate <= TIMESTAMP '1996-12-31'
           |                       THEN 1 ELSE 0 END) AS BIGINT) AS matched,
           |         CASE WHEN MAX(o_orderdate) < TIMESTAMP '1996-01-01'
           |                OR MIN(o_orderdate) > TIMESTAMP '1996-12-31' THEN 'skipped'
           |              WHEN MIN(o_orderdate) >= TIMESTAMP '1996-01-01'
           |               AND MAX(o_orderdate) <= TIMESTAMP '1996-12-31' THEN 'full'
           |              ELSE 'partial' END AS cls
           |  FROM (SELECT o_orderkey, o_orderdate, $fileExpr AS file_id FROM $src)
           |  GROUP BY file_id)""".stripMargin
      s"""WITH ranked AS (SELECT o_orderkey, o_orderdate,
         |    ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
         |  FROM orders)
         |${audit("key_order", "o_orderkey // 1024", "orders")}
         |UNION ALL
         |${audit("date_sorted", "(rn - 1) // 1024", "ranked")}
         |ORDER BY layout""".stripMargin
    },
    // bitmap index: identical 63-bit word build, word-aligned algebra
    "rel_bitmap_index" ->
      """WITH a AS (SELECT o_orderkey // 63 AS word_id,
        |             bit_or((CAST(1 AS BIGINT) << CAST(o_orderkey % 63 AS INT))) AS wa
        |           FROM orders WHERE o_totalprice > 150000 GROUP BY 1),
        |b AS (SELECT o_orderkey // 63 AS word_id,
        |        bit_or((CAST(1 AS BIGINT) << CAST(o_orderkey % 63 AS INT))) AS wb
        |      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' GROUP BY 1),
        |j AS (SELECT COALESCE(wa, CAST(0 AS BIGINT)) AS wa,
        |             COALESCE(wb, CAST(0 AS BIGINT)) AS wb
        |      FROM a FULL OUTER JOIN b ON a.word_id = b.word_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(bit_count(wa)) AS BIGINT) AS n_a,
        |       CAST(SUM(bit_count(wb)) AS BIGINT) AS n_b,
        |       CAST(SUM(bit_count((wa & wb))) AS BIGINT) AS n_and,
        |       CAST(SUM(bit_count((wa | wb))) AS BIGINT) AS n_or
        |FROM j""".stripMargin,
    // exact order statistics at integer rank targets ceil(p·n) (pure row
    // selection — no interpolation, no float); the sketch-side rank gates
    // are literal TRUE (KLL's ±4% band is ~6σ of the proven error bound)
    "rel_kll_quantiles" ->
      """WITH e AS (SELECT event_type, event_id, value FROM events),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |r AS (SELECT event_type, value,
        |       row_number() OVER (PARTITION BY event_type
        |                          ORDER BY value, event_id) AS rk FROM e),
        |x AS (SELECT r.event_type,
        |       MAX(CASE WHEN rk = (n + 1) // 2 THEN value END) AS v50,
        |       MAX(CASE WHEN rk = (9 * n + 9) // 10 THEN value END) AS v90,
        |       MAX(CASE WHEN rk = (99 * n + 99) // 100 THEN value END) AS v99
        |      FROM r JOIN n ON r.event_type = n.event_type GROUP BY 1)
        |SELECT n.event_type, n.n AS n, v50, v90, v99,
        |       TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM n JOIN x ON n.event_type = x.event_type
        |ORDER BY n.event_type""".stripMargin,
    // integer-scaled CUSUM S'_d = D·cumsum − d·T; peak by (|S'| desc,
    // day asc) ≡ Spark's max_by on (abs(s), −d_idx)
    "rel_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                      CAST(COUNT(*) AS BIGINT) AS c
        |               FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, c,
        |       CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS cum,
        |       CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS d_idx,
        |       CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS t,
        |       CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
        |      FROM daily),
        |s AS (SELECT event_type, day, nd, t, nd * cum - d_idx * t AS s FROM w),
        |p AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |                  ORDER BY abs(s) DESC, day) AS pr FROM s)
        |SELECT event_type, nd AS n_days, t AS total,
        |       CAST(day AS TIMESTAMP) AS peak_day,
        |       s AS s_peak, abs(s) AS abs_peak
        |FROM p WHERE pr = 1 ORDER BY event_type""".stripMargin,
    // identical z expression shape → identical doubles (Wilson precedent);
    // significance tests the ROUNDED z in both engines
    "rel_ab_test" ->
      """WITH conv AS (SELECT user_id,
        |         MAX(CASE WHEN event_type = 'purchase' AND value > 100
        |             THEN 1 ELSE 0 END) AS converted
        |       FROM events GROUP BY user_id),
        |v AS (SELECT user_id % 2 AS variant, CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(converted) AS BIGINT) AS x FROM conv GROUP BY 1),
        |w AS (SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
        |             MAX(CASE WHEN variant = 0 THEN x END) AS x_a,
        |             MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
        |             MAX(CASE WHEN variant = 1 THEN x END) AS x_b FROM v),
        |z AS (SELECT n_a, x_a, n_b, x_b,
        |       round(((CAST(x_a AS DOUBLE) / n_a) - (CAST(x_b AS DOUBLE) / n_b)) /
        |         sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
        |              (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
        |              (1.0 / n_a + 1.0 / n_b)), 6) AS z FROM w)
        |SELECT n_a, x_a, n_b, x_b, z, abs(z) >= 1.96 AS significant FROM z""".stripMargin,
    // median and MAD quantized at 1e-4 (equidepth/PSI cut mechanism);
    // fence arithmetic then identical doubles in both engines
    "rel_mad_outliers" ->
      """WITH o AS (SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders),
        |m AS (SELECT grp, floor(quantile_cont(v, 0.5)*10000.0 + 0.5)/10000.0 AS med
        |      FROM o GROUP BY 1),
        |d AS (SELECT o.grp, v, m.med, abs(v - m.med) AS dev
        |      FROM o JOIN m ON o.grp = m.grp),
        |md AS (SELECT grp, floor(quantile_cont(dev, 0.5)*10000.0 + 0.5)/10000.0 AS mad
        |       FROM d GROUP BY 1)
        |SELECT d.grp AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |       MAX(d.med) AS med, MAX(md.mad) AS mad,
        |       CAST(SUM(CASE WHEN dev > 4.4478 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers
        |FROM d JOIN md ON d.grp = md.grp GROUP BY 1 ORDER BY 1""".stripMargin,
    // next-fit-decreasing over the shard manifest: file = prevcum // target
    "rel_compaction_plan" ->
      """WITH s AS (SELECT source || '_' || CAST(doc_id % 4 AS VARCHAR) AS shard_id,
        |                  CAST(SUM(n_chars) AS BIGINT) AS bytes
        |           FROM documents GROUP BY 1),
        |w AS (SELECT shard_id, bytes,
        |       COALESCE(CAST(SUM(bytes) OVER (ORDER BY bytes DESC, shard_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |         AS prevcum FROM s)
        |SELECT prevcum // 16384 AS file_id, CAST(COUNT(*) AS BIGINT) AS n_inputs,
        |       CAST(SUM(bytes) AS BIGINT) AS bytes, MIN(shard_id) AS first_shard,
        |       round(CAST(SUM(bytes) AS DOUBLE) / 16384, 4) AS fill
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // same decile cuts (quantile_cont quantized 1e-4, the equidepth
    // mechanism), same smoothed ratios, one ln rounded at 6 dp
    "rel_psi_drift" ->
      """WITH o AS (SELECT o_orderkey % 2 AS half,
        |                  CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice * 1.1
        |                       ELSE o_totalprice END AS v FROM orders),
        |cuts AS (SELECT list_transform(
        |           quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |           c -> floor(c*10000.0 + 0.5)/10000.0) AS cuts
        |         FROM o WHERE half = 0),
        |counts AS (
        |  SELECT 1 + len(list_filter(cuts, c -> v > c)) AS bucket,
        |         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        |         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |  FROM o CROSS JOIN cuts GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_old) AS BIGINT) AS t_old,
        |               CAST(SUM(n_new) AS BIGINT) AS t_new FROM counts)
        |SELECT bucket, n_old, n_new,
        |  round((CAST(n_old + 1 AS DOUBLE) / (t_old + 10) -
        |         CAST(n_new + 1 AS DOUBLE) / (t_new + 10)) *
        |        ln((CAST(n_old + 1 AS DOUBLE) / (t_old + 10)) /
        |           (CAST(n_new + 1 AS DOUBLE) / (t_new + 10))), 6) AS psi_term
        |FROM counts CROSS JOIN tot
        |ORDER BY bucket""".stripMargin,
    // logical split of the base table; the engine result arrives through
    // a real two-generation parquet write + mergeSchema read
    "rel_schema_evolution" ->
      """SELECT * FROM (
        |  SELECT 1 AS gen, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |         CAST(0 AS BIGINT) AS n_with_priority,
        |         round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |           AS total
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(COUNT(o_orderpriority) AS BIGINT),
        |         round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |ORDER BY gen""".stripMargin,
    // same statistics algebra over the same exact counts
    "rel_join_cardinality" ->
      """WITH cnt AS (SELECT CASE WHEN l_orderkey % 10 < 4 THEN -1
        |                         ELSE l_partkey % 500 END AS k,
        |                    CAST(COUNT(*) AS BIGINT) AS c
        |             FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS d,
        |               CAST(SUM(c*c) AS BIGINT) AS actual_pairs FROM cnt),
        |mcv AS (SELECT c FROM cnt ORDER BY c DESC, k LIMIT 10),
        |m AS (SELECT CAST(SUM(c) AS BIGINT) AS m_n, CAST(SUM(c*c) AS BIGINT) AS m_sq,
        |             CAST(COUNT(*) AS BIGINT) AS m_d FROM mcv),
        |est AS (SELECT n, d, actual_pairs,
        |  round(CAST(n AS DOUBLE) * n / d, 4) AS est_uniform,
        |  round(m_sq + CAST(n - m_n AS DOUBLE) * (n - m_n) / (d - m_d), 4) AS est_mcv
        |  FROM tot CROSS JOIN m)
        |SELECT n, d, actual_pairs, est_uniform, est_mcv,
        |  round(est_uniform / actual_pairs, 6) AS err_uniform,
        |  round(est_mcv / actual_pairs, 6) AS err_mcv
        |FROM est""".stripMargin,
    // per-pair distinct counts computed independently (engine batches
    // them per-LHS; the oracle's 20 scalar subqueries are the naive form)
    "rel_fd_discovery" -> {
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      val pairs = for (x <- cols; y <- cols if x != y) yield
        s"""SELECT '$x' AS lhs, '$y' AS rhs,
           |  CAST((SELECT COUNT(DISTINCT $x) FROM customer) AS BIGINT) AS n_lhs,
           |  CAST((SELECT COUNT(DISTINCT ($x, $y)) FROM customer) AS BIGINT) AS n_pairs""".stripMargin
      pairs.mkString("SELECT lhs, rhs, n_lhs, n_pairs, (n_pairs = n_lhs) AS holds FROM (\n",
        "\nUNION ALL\n", "\n) ORDER BY lhs, rhs")
    },
    // exact sliding-window distinct + the sketch gate (hllShards contract)
    "rel_sliding_distinct" ->
      """WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day AS wday FROM ev)
        |SELECT w.wday AS window_end_day,
        |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_exact,
        |       TRUE AS est_ok
        |FROM days w JOIN ev e ON e.day BETWEEN w.wday - 6 AND w.wday
        |GROUP BY w.wday ORDER BY window_end_day""".stripMargin,
    // definitional check: ΔV = (new full view) EXCEPT (old view) —
    // runnable only at oracle scale, which is the point
    "rel_incremental_join" ->
      """WITH vnew AS (SELECT o_orderkey, l_linenumber, o_orderstatus, l_quantity
        |              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |vold AS (SELECT o_orderkey, l_linenumber, o_orderstatus, l_quantity
        |         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |         WHERE o_orderkey % 50 <> 0 AND l_orderkey % 71 <> 0)
        |SELECT * FROM vnew EXCEPT ALL SELECT * FROM vold
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,
    // brute-force dominance check — structurally independent of the
    // engine's bucketed prefix-max formulation
    "rel_skyline" ->
      """WITH s AS (SELECT p_partkey, p_retailprice, p_size FROM part)
        |SELECT p_partkey, p_retailprice, p_size FROM s a
        |WHERE NOT EXISTS (SELECT 1 FROM s b
        |  WHERE (b.p_retailprice < a.p_retailprice AND b.p_size >= a.p_size)
        |     OR (b.p_retailprice <= a.p_retailprice AND b.p_size > a.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin,
    // exact half-life decay: integer-exponent power-of-two weights make
    // every term a DECIMAL-exact product; the sum is order-independent
    "rel_time_decay" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS tsu,
        |                   CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |mx AS (SELECT max(tsu) AS max_tsu FROM ev)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       round(CAST(SUM(CASE WHEN k < 62
        |                     THEN v * (CAST(1 AS BIGINT) << CAST(62 - k AS INT))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |             / power(2.0, 62), 6) AS decayed
        |FROM (SELECT event_type, (max_tsu - tsu) // 86400000000 AS k, v
        |      FROM ev CROSS JOIN mx)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // salting is a physical rewrite — the oracle is the plain join
    "rel_salted_join" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
        |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the Bloom pre-filter only drops rows the join would drop anyway
    "rel_bloom_join" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
        |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // exact distinct + the sketch gate (Spark computes the estimate; the
    // oracle pins the exact count and asserts the gate held)
    "rel_hll_shards" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |       TRUE AS est_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "rel_star_join" ->
      """SELECT n_name,
        |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_lineitems
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "rel_benford_audit" ->
      """WITH counts AS (
        |  SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS d,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders
        |  WHERE CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT)
        |        BETWEEN 1 AND 9
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
        |SELECT d, n,
        |  ROUND(CAST(n AS DOUBLE) / total, 6) AS observed_share,
        |  ROUND(log10(1.0 + 1.0 / d), 6) AS benford_share,
        |  ROUND(POWER(ROUND(CAST(n AS DOUBLE) / total, 6)
        |          - ROUND(log10(1.0 + 1.0 / d), 6), 2)
        |        / ROUND(log10(1.0 + 1.0 / d), 6), 8) AS sq_rel_dev
        |FROM counts CROSS JOIN t
        |ORDER BY d""".stripMargin,

    "rel_snapshot_diff" ->
      """WITH old AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |             FROM customer),
        |neu AS (
        |  SELECT k, seg AS n_seg,
        |         CASE WHEN k % 10 = 3 THEN bal + 100.0 ELSE bal END AS n_bal
        |  FROM old WHERE k % 10 <> 4
        |  UNION ALL
        |  SELECT k + 1000000, seg, 500.0 FROM old WHERE k % 100 = 7),
        |j AS (SELECT * FROM old FULL OUTER JOIN neu USING (k))
        |SELECT CASE WHEN seg IS NULL THEN 'added'
        |            WHEN n_seg IS NULL THEN 'removed'
        |            WHEN seg IS NOT DISTINCT FROM n_seg
        |             AND bal IS NOT DISTINCT FROM n_bal THEN 'unchanged'
        |            ELSE 'changed' END AS diff_class,
        |       CAST(COUNT(*) AS BIGINT) AS n_keys,
        |       CAST(SUM(CASE WHEN seg IS DISTINCT FROM n_seg THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_seg_changes,
        |       CAST(SUM(CASE WHEN bal IS DISTINCT FROM n_bal THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_bal_changes
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // lossless day-partitioned round trip, so the oracle is the direct scan
    "rel_partitioned_sink_read" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 4) AS sum_value
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // the range-partitioned landing's physical boundaries come from
    // Spark's sampler, so the census emits only sampler-independent layout
    // invariants; the oracle states them from the logical table (disjoint
    // file ranges ⇒ 0 violations, lossless ⇒ count/min/max of the scan)
    "rel_range_snapshot_census" ->
      s"""SELECT CAST(${graft.relational.RelationalQueries.RangeSnapshotFiles}
        |         AS BIGINT) AS n_files,
        |       CAST(COUNT(*) AS BIGINT) AS total_rows,
        |       CAST(0 AS BIGINT) AS overlap_violations,
        |       CAST(MIN(o_orderkey) AS BIGINT) AS key_min,
        |       CAST(MAX(o_orderkey) AS BIGINT) AS key_max
        |FROM orders""".stripMargin,

    // the bucketed landing is a lossless re-layout, so the oracle is the
    // plain join over the raw tables
    "rel_bucketed_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       ROUND(SUM(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "rel_bucketed_agg" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       ROUND(SUM(o_totalprice), 2) AS spend
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "rel_json_props" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(COUNT(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS n_parsed,
        |       MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
        |       MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
        |       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "rel_cdc_compact" ->
      """WITH log AS (
        |  SELECT o_orderkey AS k, 1 AS seq, 'I' AS op,
        |         o_orderstatus AS status, o_totalprice AS price FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U', o_orderstatus, o_totalprice + 10.0
        |  FROM orders WHERE o_orderkey % 10 = 2
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'D', o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 4),
        |last AS (
        |  SELECT k, arg_max(op, seq) AS op, arg_max(status, seq) AS status,
        |         arg_max(price, seq) AS price
        |  FROM log GROUP BY k)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       ROUND(SUM(price), 2) AS sum_price,
        |       CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_updated
        |FROM last WHERE op <> 'D'
        |GROUP BY status
        |ORDER BY status""".stripMargin,

    "rel_fk_audit" ->
      Seq(
        fkAuditSql("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem->orders"),
        fkAuditSql("orders", "o_custkey", "customer", "c_custkey", "orders->customer"),
        fkAuditSql("lineitem", "l_suppkey", "supplier", "s_suppkey", "lineitem->supplier"))
        .map(q => s"($q)").mkString("", "\nUNION ALL\n", "\nORDER BY relation"),

    "rel_cumulative_users" ->
      """WITH first_seen AS (
        |  SELECT user_id, date_trunc('day', MIN(ts)) AS day
        |  FROM events GROUP BY user_id),
        |daily AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        |          FROM first_seen GROUP BY day)
        |SELECT CAST(CAST(day AS TIMESTAMP) AS VARCHAR) AS day, new_users,
        |       CAST(SUM(new_users) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cumulative_users
        |FROM daily
        |ORDER BY day""".stripMargin,

    "rel_zorder_key" ->
      s"""WITH b AS (
         |  SELECT o_orderkey,
         |         CAST(o_custkey % 256 AS INT) AS bx,
         |         CAST((CAST(o_orderdate AS DATE) - DATE '1992-01-01') % 256 AS INT)
         |           AS bz
         |  FROM orders WHERE o_orderkey % 500 = 0)
         |SELECT o_orderkey, bx AS bucket_cust, bz AS bucket_day,
         |       CAST($mortonSql AS INT) AS zkey
         |FROM b
         |ORDER BY o_orderkey""".stripMargin,

    "rel_temporal_join" ->
      """WITH dim AS (
        |  SELECT o_custkey AS custkey, o_orderkey AS version_key,
        |         CAST(o_orderdate AS DATE) AS valid_from,
        |         LEAD(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |           ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS valid_to
        |  FROM orders WHERE o_custkey % 211 = 0),
        |facts AS (
        |  SELECT o_custkey AS custkey, l_orderkey, l_linenumber,
        |         CAST(l_shipdate AS DATE) AS ship_d
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_custkey % 211 = 0)
        |SELECT f.custkey, l_orderkey, l_linenumber,
        |       CAST(ship_d AS VARCHAR) AS ship_date,
        |       CAST(MIN(version_key) AS BIGINT) AS version_key,
        |       CAST(COUNT(*) AS BIGINT) AS n_versions
        |FROM facts f JOIN dim d ON f.custkey = d.custkey
        |  AND ship_d >= valid_from AND (valid_to IS NULL OR ship_d < valid_to)
        |GROUP BY f.custkey, l_orderkey, l_linenumber, ship_d
        |ORDER BY f.custkey, l_orderkey, l_linenumber""".stripMargin,

    "rel_event_transitions" ->
      """WITH t AS (
        |  SELECT event_type AS from_type,
        |         LEAD(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(CAST(COUNT(*) AS DOUBLE) /
        |         SUM(COUNT(*)) OVER (PARTITION BY from_type), 4) AS share
        |FROM t WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,

    "rel_equidepth_hist" ->
      """WITH cuts AS (
  -- floor-quantized to 4 dp like the engine: quantile interpolation can
  -- differ in the last ulp between engines, flipping '>' on exact-hit cuts
        |  SELECT list_transform(quantile_cont(o_totalprice,
        |      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    c -> floor(c * 10000 + 0.5) / 10000) AS cuts
        |  FROM orders)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       ROUND(MIN(o_totalprice), 2) AS lo,
        |       ROUND(MAX(o_totalprice), 2) AS hi
        |FROM (SELECT o_totalprice,
        |        1 + len(list_filter(cuts, c -> o_totalprice > c)) AS bucket
        |      FROM orders CROSS JOIN cuts)
        |GROUP BY bucket
        |ORDER BY bucket""".stripMargin,

    "rel_skew_report" ->
      """WITH counts AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |                FROM events GROUP BY user_id),
        |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |                 CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |                 QUANTILE_CONT(cnt, 0.5) AS median_cnt
        |          FROM counts),
        |top AS (SELECT user_id, cnt FROM counts
        |        ORDER BY cnt DESC, user_id LIMIT 10)
        |SELECT user_id, cnt,
        |       ROUND(CAST(cnt AS DOUBLE) / n_rows, 6) AS row_share,
        |       n_keys, n_rows,
        |       ROUND(CAST(cnt AS DOUBLE) / median_cnt, 4) AS skew_factor
        |FROM top CROSS JOIN stats
        |ORDER BY cnt DESC, user_id""".stripMargin,

    "rel_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_view,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_click,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase,
        |       ROUND(CAST((SELECT COUNT(*) FROM s2) AS DOUBLE) /
        |             (SELECT COUNT(*) FROM s1), 4) AS view_to_click,
        |       ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE) /
        |             (SELECT COUNT(*) FROM s2), 4) AS click_to_purchase""".stripMargin,

    "rel_cohorts" ->
      """WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id),
        |d AS (SELECT DISTINCT user_id, wk FROM e)
        |SELECT CAST(CAST(cohort_wk AS TIMESTAMP) AS VARCHAR) AS cohort_week,
        |       CAST((CAST(epoch(wk) AS BIGINT) - CAST(epoch(cohort_wk) AS BIGINT))
        |         // 604800 AS BIGINT) AS age_weeks,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM d JOIN f USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "rel_interpolate" ->
      """WITH sparse AS (
  -- value-sorted fold + floor-quantize, mirroring the engine: AVG's
  -- partial-sum order is partition-dependent and ROUND's half-case
  -- diverges between engines, so neither may feed the lerp
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |         floor(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |                 list_sort(list(value))), (a, b) -> a + b)
        |               / COUNT(*) * 10000 + 0.5) / 10000 AS v
        |  FROM events WHERE event_id % 23 = 0 GROUP BY 1, 2),
        |bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
        |                  date_trunc('hour', MAX(ts)) AS hi FROM events),
        |spine AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |            AS hour
        |          FROM (SELECT DISTINCT event_type FROM events) CROSS JOIN bounds),
        |filled AS (
        |  SELECT s.event_type, s.hour, sp.v,
        |    LAST_VALUE(sp.v IGNORE NULLS) OVER (PARTITION BY s.event_type
        |      ORDER BY s.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    LAST_VALUE(CASE WHEN sp.v IS NOT NULL THEN s.hour END IGNORE NULLS)
        |      OVER (PARTITION BY s.event_type ORDER BY s.hour
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |    FIRST_VALUE(sp.v IGNORE NULLS) OVER (PARTITION BY s.event_type
        |      ORDER BY s.hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    FIRST_VALUE(CASE WHEN sp.v IS NOT NULL THEN s.hour END IGNORE NULLS)
        |      OVER (PARTITION BY s.event_type ORDER BY s.hour
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        |  FROM spine s LEFT JOIN sparse sp
        |    ON s.event_type = sp.event_type AND s.hour = sp.hour)
        |SELECT event_type, CAST(hour AS VARCHAR) AS hour,
        |  CASE WHEN v IS NOT NULL THEN 'known'
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interpolated'
        |       ELSE 'missing' END AS status,
  -- floor(x*1e4 + 0.5)/1e4, NOT round(x, 4): the lerp of two 4-dp
  -- neighbors lands exactly on .xxxx5 halves (e.g. frac = 1/2), where
  -- the engines' round() implementations disagree; floor of the same
  -- IEEE double is deterministic in both
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         floor((pv + (nv - pv) *
        |             CAST(epoch(hour) - epoch(pt) AS DOUBLE) /
        |             CAST(epoch(nt) - epoch(pt) AS DOUBLE)) * 10000.0 + 0.5)
        |           / 10000.0
        |  END AS value
        |FROM filled
        |ORDER BY event_type, hour""".stripMargin,

    "rel_date_spine" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n,
        |         ROUND(SUM(o_totalprice), 2) AS tot
        |  FROM orders GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |           (SELECT MIN(d) FROM daily),
        |           (SELECT MAX(d) FROM daily), INTERVAL 1 DAY)) AS DATE) AS d)
        |SELECT CAST(s.d AS VARCHAR) AS day,
        |       COALESCE(n, 0) AS n_orders,
        |       COALESCE(tot, 0.0) AS total_price
        |FROM spine s LEFT JOIN daily ON s.d = daily.d
        |ORDER BY day""".stripMargin,

    "rel_window_share" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |       ROUND(o_totalprice / SUM(o_totalprice) OVER (PARTITION BY o_orderpriority), 6)
        |         AS pct_of_total,
        |       first_value(o_totalprice) OVER w AS top_price,
        |       nth_value(o_totalprice, 3) OVER w AS third_price
        |FROM orders
        |WHERE o_orderkey % 97 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    // try_divide(x, 0) is NULL in Spark; DuckDB double division by zero is
    // inf, so the oracle spells the NULL out
    "rel_try_ops" ->
      """WITH t AS (
        |  SELECT o_orderpriority,
        |         TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_orderkey AS VARCHAR)
        |                       ELSE 'x' || CAST(o_orderkey AS VARCHAR) END AS BIGINT)
        |           AS parsed,
        |         CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |              ELSE o_totalprice / (o_orderkey % 5) END AS divided
        |  FROM orders)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(COUNT(parsed) AS BIGINT) AS n_parsed,
        |       CAST(SUM(CASE WHEN divided IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_div_null,
        |       ROUND(SUM(COALESCE(divided, 0.0)), 2) AS sum_divided
        |FROM t GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "rel_upsert" ->
      """WITH snap AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |              FROM customer),
        |changes AS (
        |  SELECT k, seg AS c_seg, bal + 100.0 AS c_bal, FALSE AS deleted
        |  FROM snap WHERE k % 10 = 3
        |  UNION ALL
        |  SELECT k, seg, bal, TRUE FROM snap WHERE k % 10 = 4
        |  UNION ALL
        |  SELECT k + 1000000, seg, 500.0, FALSE FROM snap WHERE k % 100 = 7),
        |merged AS (
        |  SELECT COALESCE(c.c_seg, s.seg) AS seg,
        |         COALESCE(c.c_bal, s.bal) AS bal,
        |         c.deleted IS NOT NULL AS was_changed
        |  FROM snap s FULL OUTER JOIN changes c ON s.k = c.k
        |  WHERE COALESCE(c.deleted, FALSE) = FALSE)
        |SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CASE WHEN was_changed THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |       ROUND(SUM(bal), 2) AS total_bal
        |FROM merged GROUP BY seg ORDER BY seg""".stripMargin,

    "rel_scd2" ->
      """WITH v AS (
        |  SELECT o_custkey AS custkey, o_orderkey AS version_key,
        |         CAST(o_orderdate AS DATE) AS valid_from
        |  FROM orders WHERE o_custkey % 211 = 0),
        |iv AS (
        |  SELECT custkey, version_key, valid_from,
        |         lead(valid_from) OVER (PARTITION BY custkey
        |           ORDER BY valid_from, version_key) AS valid_to
        |  FROM v)
        |SELECT custkey, version_key,
        |       CAST(valid_from AS VARCHAR) AS valid_from,
        |       CAST(valid_to AS VARCHAR) AS valid_to,
        |       valid_to IS NULL AS is_current,
        |       CAST(valid_to - valid_from AS INTEGER) AS days_valid
        |FROM iv
        |ORDER BY custkey, valid_from, version_key""".stripMargin,

    "rel_lateral" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin,

    "rel_corr_regr" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |       ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |       ROUND(COVAR_POP(l_quantity, l_extendedprice), 2) AS covar,
        |       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
        |       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS intercept
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "rel_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |runs AS (SELECT user_id,
        |                d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
        |                    AS INTEGER) AS anchor
        |         FROM days),
        |islands AS (SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len
        |            FROM runs GROUP BY user_id, anchor)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |       CAST(COUNT(*) AS BIGINT) AS n_islands,
        |       CAST(MAX(len) AS BIGINT) AS longest_streak
        |FROM islands
        |WHERE user_id % 7 = 0
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "rel_unpivot" ->
      """WITH w AS (SELECT o_orderpriority,
        |                  ROUND(SUM(o_totalprice), 2) AS total_price,
        |                  ROUND(AVG(o_totalprice), 2) AS avg_price,
        |                  CAST(COUNT(*) AS DOUBLE) AS n_orders
        |           FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, metric, value FROM (
        |  SELECT o_orderpriority, 'total_price' AS metric, total_price AS value FROM w
        |  UNION ALL
        |  SELECT o_orderpriority, 'avg_price', avg_price FROM w
        |  UNION ALL
        |  SELECT o_orderpriority, 'n_orders', n_orders FROM w)
        |ORDER BY o_orderpriority, metric""".stripMargin,

    "rel_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM lineitem GROUP BY l_returnflag, l_quantity),
        |m AS (SELECT l_returnflag, MAX(cnt) AS max_cnt FROM c GROUP BY l_returnflag)
        |SELECT c.l_returnflag, MIN(c.l_quantity) AS mode_quantity,
        |       CAST(MIN(c.max_cnt) AS BIGINT) AS mode_count
        |FROM (SELECT c.*, m.max_cnt FROM c JOIN m USING (l_returnflag)
        |      WHERE c.cnt = m.max_cnt) c
        |GROUP BY c.l_returnflag
        |ORDER BY c.l_returnflag""".stripMargin,

    // direct full aggregate — the Spark side merges base+delta partials,
    // so equality proves partial-merge ≡ recompute. avg divides the
    // 4dp-rounded sum, mirroring the Spark column exactly.
    "rel_incremental_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       ROUND(SUM(value), 4) AS sum_value,
        |       ROUND(ROUND(SUM(value), 4) / COUNT(*), 4) AS avg_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "rel_fuzzy_join" ->
      s"""WITH c AS (
         |  SELECT c_custkey, c_name, ${sortedChars("c_name")} AS bk
         |  FROM customer),
         |probes AS (
         |  SELECT c_custkey AS probe_id, $corruptedName AS probe_name
         |  FROM customer WHERE c_custkey % 13 = 0),
         |p2 AS (
         |  SELECT probe_id, probe_name, ${sortedChars("probe_name")} AS bk
         |  FROM probes)
         |SELECT probe_id, probe_name, c_custkey, c_name,
         |       CAST(levenshtein(probe_name, c_name) AS INT) AS dist
         |FROM p2 JOIN c USING (bk)
         |WHERE levenshtein(probe_name, c_name) <= 2
         |ORDER BY probe_id, dist, c_custkey""".stripMargin,

    "rel_profile" ->
      Seq("o_orderkey" -> true, "o_custkey" -> true,
        "o_orderpriority" -> false, "o_totalprice" -> true)
        .map { case (c, n) => profileCol(c, n) }
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name"),

    "rel_expectations" ->
      """WITH b AS (
        |  SELECT count(*) AS n_rows,
        |         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
        |         count(DISTINCT (l_orderkey, l_linenumber)) AS n_pairs,
        |         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |         CAST(sum(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty30,
        |         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
        |         CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS v_tax,
        |         CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |         CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS v_flag
        |  FROM lineitem),
        |fk AS (
        |  SELECT count(*) AS v_fk FROM lineitem l
        |  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderkey IS NULL),
        |rows AS (
        |  SELECT 'accepted_values(l_returnflag, [A,N,R])' AS check_name, v_flag AS n_violations FROM b
        |  UNION ALL SELECT 'fk(l_orderkey -> orders.o_orderkey)', v_fk FROM fk
        |  UNION ALL SELECT 'non_negative(l_extendedprice)', v_price FROM b
        |  UNION ALL SELECT 'not_null(l_orderkey)', v_nn FROM b
        |  UNION ALL SELECT 'range(l_discount, 0, 0.1)', v_disc FROM b
        |  UNION ALL SELECT 'range(l_quantity, 1, 50)', v_qty FROM b
        |  UNION ALL SELECT 'range(l_tax, 0, 0.08)', v_tax FROM b
        |  UNION ALL SELECT 'strict_max(l_quantity, 30)', v_qty30 FROM b
        |  UNION ALL SELECT 'unique(l_orderkey, l_linenumber)', n_rows - n_pairs FROM b)
        |SELECT check_name, n_violations,
        |       CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM rows ORDER BY check_name""".stripMargin,

    "rel_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       COUNT(DISTINCT l_orderkey) AS n_orders,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "rel_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "rel_dim_chain" ->
      """SELECT r_name, COUNT(*) AS n_customers,
        |       ROUND(AVG(c_acctbal), 4) AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "rel_semi_topk" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |       ROUND(SUM(o_totalprice), 2) AS total_spent
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT o_custkey FROM orders
        |  GROUP BY o_custkey
        |  ORDER BY COUNT(*) DESC, o_custkey
        |  LIMIT 5)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "rel_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "rel_scalar_subquery" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |WHERE l_orderkey = (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  ORDER BY COUNT(*) DESC, l_orderkey
        |  LIMIT 1)
        |ORDER BY l_linenumber""".stripMargin,

    "rel_union_total" ->
      """SELECT status, CAST(n_orders AS BIGINT) AS n_orders FROM (
        |  SELECT o_orderstatus AS status, COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT 'ALL' AS status, COUNT(*) AS n_orders FROM orders)
        |ORDER BY status""".stripMargin,

    "rel_weighted_mean" ->
      """WITH per AS (
        |  SELECT c_nationkey, AVG(c_acctbal) AS avg_bal, COUNT(*) AS n
        |  FROM customer GROUP BY c_nationkey)
        |SELECT ROUND(SUM(avg_bal * n) / CAST(SUM(n) AS DOUBLE), 4) AS weighted_avg_acctbal,
        |       CAST(SUM(n) AS BIGINT) AS n_customers
        |FROM per""".stripMargin,

    "rel_group_concat" ->
      """SELECT r_name,
        |       STRING_AGG(n_name, ', ' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "rel_pivot" ->
      """SELECT CAST(HOUR(ts) AS BIGINT) AS hour_of_day,
        |       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events
        |GROUP BY CAST(HOUR(ts) AS BIGINT)
        |ORDER BY hour_of_day""".stripMargin,

    "rel_collect_explode" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey
        |FROM orders
        |ORDER BY custkey, orderkey""".stripMargin,

    "rel_seasonal" ->
      """WITH e AS (
        |  SELECT event_id, value,
        |         dayofweek(ts) AS dow, CAST(hour(ts) AS INT) AS hr
        |  FROM events),
        |prof AS (
        |  SELECT dow, hr, CAST(COUNT(*) AS BIGINT) AS n_cell,
        |         AVG(value) AS mu
        |  FROM e GROUP BY dow, hr)
        |SELECT event_id, e.dow, e.hr, n_cell, value,
        |       ROUND(mu, 4) AS seasonal_mean,
        |       ROUND(value - mu, 4) AS residual,
        |       ROUND(ABS(value - mu), 4) AS abs_residual
        |FROM e JOIN prof ON e.dow = prof.dow AND e.hr = prof.hr
        |ORDER BY abs_residual DESC, event_id
        |LIMIT 15""".stripMargin,

    "rel_events_hourly" ->
      """SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
        |       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        |FROM events
        |GROUP BY DATE_TRUNC('hour', ts), event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "rel_events_enriched" ->
      """SELECT c_mktsegment, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |       ROUND(SUM(value), 4) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,

    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "rel_set_ops" ->
      """WITH u AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |     h AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
        |SELECT o_custkey, 'both' AS set_op FROM (SELECT * FROM u INTERSECT SELECT * FROM h)
        |UNION ALL
        |SELECT o_custkey, 'urgent_only' AS set_op FROM (SELECT * FROM u EXCEPT SELECT * FROM h)
        |ORDER BY set_op, o_custkey""".stripMargin,

    "rel_asof_join_native" ->
      """SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id,
        |       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
        |                FROM events WHERE event_type = 'view'
        |                GROUP BY user_id, ts) v
        |  ON c.user_id = v.user_id AND v.ts <= c.ts
        |ORDER BY click_id""".stripMargin,

    "rel_asof_join" ->
      """SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id,
        |       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
        |                FROM events WHERE event_type = 'view'
        |                GROUP BY user_id, ts) v
        |  ON c.user_id = v.user_id AND v.ts <= c.ts
        |ORDER BY click_id""".stripMargin,

    "rel_range_join" ->
      """SELECT b.r_regionkey AS band_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       ROUND(SUM(e.value), 4) AS sum_value
        |FROM events e JOIN region b
        |  ON e.value >= b.r_regionkey * 100.0 AND e.value < (b.r_regionkey + 1) * 100.0
        |GROUP BY b.r_regionkey
        |ORDER BY band_id""".stripMargin,

    "rel_stddev" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |       ROUND(AVG(c_acctbal), 4) AS avg_bal,
        |       ROUND(STDDEV_POP(c_acctbal), 4) AS stddev_bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "rel_nullif_div" ->
      """SELECT l_returnflag,
        |       ROUND(AVG(l_extendedprice / NULLIF(l_discount, 0.0)), 4) AS avg_price_per_discount,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "rel_isin_filter" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus <> 'F'
        |GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "rel_multi_sort" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier
        |ORDER BY s_nationkey, s_acctbal DESC, s_suppkey""".stripMargin,

    "rel_topk_per_group" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_extendedprice DESC, l_linenumber) AS INT) AS rn
        |  FROM lineitem)
        |WHERE rn <= 2
        |ORDER BY l_orderkey, rn""".stripMargin,
    "rel_window_rank" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderstatus, rn""".stripMargin,

    "rel_window_running" ->
      """SELECT user_id, event_id,
        |       ROUND(SUM(value) OVER (PARTITION BY user_id
        |         ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
        |FROM events
        |WHERE user_id < 20
        |ORDER BY user_id, event_id""".stripMargin,

    // <=> ≡ IS NOT DISTINCT FROM: the null-short-name group must join
    "rel_null_safe_join" ->
      (graft.transit.TransitTables.sqlPrelude +
        """, counts AS (
          |  SELECT r.route_short_name, COUNT(*) AS n_trips
          |  FROM trips t JOIN routes r ON r.route_id = t.route_id
          |  GROUP BY r.route_short_name),
          |names AS (
          |  SELECT route_short_name, COUNT(*) AS n_routes
          |  FROM routes GROUP BY route_short_name)
          |SELECT c.route_short_name, c.n_trips, CAST(n.n_routes AS BIGINT) AS n_routes
          |FROM counts c JOIN names n
          |  ON c.route_short_name IS NOT DISTINCT FROM n.route_short_name
          |ORDER BY c.route_short_name""".stripMargin),

    // Spark grouping_id: leftmost cube column = most significant bit
    "rel_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       ROUND(SUM(o_totalprice), 2) AS total_price,
        |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "rel_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       ROUND(SUM(o_totalprice), 2) AS total_price,
        |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "rel_range_frame" ->
      """SELECT event_id, event_type, epoch_us(ts) AS us,
        |       ROUND(SUM(value) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 4) AS rolling_10m
        |FROM events
        |WHERE user_id < 50
        |ORDER BY event_id""".stripMargin,

    "rel_lead_lag" ->
      """SELECT user_id, event_id,
        |       epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_prev_us,
        |       LEAD(epoch_us(ts), 1) OVER w - epoch_us(ts) AS gap_next_us
        |FROM events
        |WHERE user_id < 10
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "rel_ntile" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |       CAST(NTILE(4) OVER w AS INT) AS quartile,
        |       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |       ROUND(CUME_DIST() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |QUALIFY c_custkey % 97 = 0
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    // exact columns + literal TRUE: the Spark side computes the tolerance
    // boolean in-plan from the real sketches, so a drifting sketch fails
    // the hash even though sketch estimates themselves aren't portable
    "rel_approx_agg" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_orderkey) AS exact_orders,
        |       ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS exact_median_price,
        |       COUNT(*) AS n_rows,
        |       TRUE AS approx_within_5pct
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "rel_percentiles" ->
      """SELECT o_orderpriority,
        |       ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS p25,
        |       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50,
        |       ROUND(QUANTILE_CONT(o_totalprice, 0.75), 4) AS p75,
        |       COUNT(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "rel_full_outer" ->
      """WITH c AS (SELECT c_custkey AS custkey, c_mktsegment
        |           FROM customer WHERE c_custkey % 7 = 0),
        |     o AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders
        |           FROM orders WHERE o_custkey % 5 = 0 GROUP BY o_custkey)
        |SELECT CASE WHEN c.c_mktsegment IS NOT NULL THEN 'present' ELSE 'absent' END
        |         AS customer_side,
        |       CASE WHEN o.n_orders IS NOT NULL THEN 'present' ELSE 'absent' END
        |         AS orders_side,
        |       COUNT(*) AS n_keys,
        |       CAST(SUM(COALESCE(o.n_orders, 0)) AS BIGINT) AS total_orders
        |FROM c FULL OUTER JOIN o ON c.custkey = o.custkey
        |GROUP BY 1, 2
        |ORDER BY customer_side, orders_side""".stripMargin,

    "rel_exists_subquery" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "rel_array_ops" ->
      """WITH g AS (
        |  SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
        |  FROM lineitem WHERE l_orderkey % 1000 = 0
        |  GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |       CAST(len(qs) AS INT) AS n,
        |       qs[1] AS q_min,
        |       qs[-1] AS q_max,
        |       array_to_string(qs[1:3], ',') AS first3,
        |       list_contains(qs, 1.0) AS has_one,
        |       len(list_filter(qs, x -> x > 40.0)) > 0 AS any_gt40,
        |       len(list_filter(qs, x -> NOT (x > 0.0))) = 0 AS all_pos,
        |       CAST(len(list_distinct(qs)) AS INT) AS n_distinct
        |FROM g
        |ORDER BY l_orderkey""".stripMargin,

    // DuckDB dayofweek is 0=Sunday..6; Spark is 1=Sunday..7
    "rel_datetime_ops" ->
      """SELECT event_id,
        |       CAST(year(ts) AS INT) AS y,
        |       CAST(quarter(ts) AS INT) AS q,
        |       CAST(month(ts) AS INT) AS m,
        |       CAST(day(ts) AS INT) AS d,
        |       CAST(hour(ts) AS INT) AS h,
        |       CAST(minute(ts) AS INT) AS mi,
        |       CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |       CAST(dayofyear(ts) AS INT) AS doy,
        |       date_trunc('day', ts) AS day_start,
        |       CAST(CAST(ts AS DATE) + 30 AS VARCHAR) AS plus30,
        |       CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS month_end
        |FROM events
        |WHERE user_id < 3
        |ORDER BY event_id""".stripMargin,

    "rel_string_ops" ->
      """SELECT c_custkey,
        |       upper(c_name) AS name_upper,
        |       CAST(length(c_name) AS INT) AS name_len,
        |       substr(c_name, 1, 8) AS name_prefix,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |       translate(c_name, '#', '-') AS name_dashed,
        |       regexp_replace(c_name, '[0-9]', '', 'g') AS name_nodigits,
        |       CAST(instr(c_name, '0') AS INT) AS first_zero_pos,
        |       reverse(c_mktsegment) AS segment_rev,
        |       CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS seg_dist
        |FROM customer
        |WHERE c_custkey % 100 = 0
        |ORDER BY c_custkey""".stripMargin,

    // map build + explode round trip ≡ the per-(custkey,status) counts,
    // with the map's cardinality as a per-key window count
    "rel_map_entries" ->
      """WITH per AS (
        |  SELECT o_custkey AS custkey, o_orderstatus AS status, COUNT(*) AS n
        |  FROM orders GROUP BY o_custkey, o_orderstatus)
        |SELECT custkey, status, CAST(n AS BIGINT) AS n,
        |       CAST(COUNT(*) OVER (PARTITION BY custkey) AS INT) AS n_statuses
        |FROM per
        |ORDER BY custkey, status""".stripMargin)
}
