package graft.dedup

import graft.functions.TextHashSql._

/** DuckDB oracle SQL mirroring [[Dedup]]. Structure note: every query
  * shares the CTE prelude that recomputes shingle sets / signatures with
  * the exact integer formulas of graft.functions.TextHash. */
object DedupOracles {

  /** In-query mirror of [[Dedup.annPlanesFor]] — the data-adaptive LSH
    * plane count as a one-row CTE body: smallest p in
    * [AnnPlanes, AnnMaxPlanes] with AnnBucketTarget·2^p ≥ count(*), the
    * COALESCE saturating at [[Dedup.AnnMaxPlanes]] exactly as the Scala
    * while-loop's cap does (shared bound — see AnnMaxPlanes scaladoc).
    * Shared by every oracle whose Spark face blocks on adaptive planes
    * (embedding near-dup, ood-knn, nn-descent). */
  def annPlanesCte(table: String): String =
    s"""
       |  SELECT COALESCE(MIN(p), ${Dedup.AnnMaxPlanes}) AS planes
       |  FROM range(${Dedup.AnnPlanes}, ${Dedup.AnnMaxPlanes + 1}) t(p)
       |  WHERE (CAST(${Dedup.AnnBucketTarget} AS BIGINT) << p) >=
       |        (SELECT count(*) FROM $table)""".stripMargin

  // AS MATERIALIZED: DuckDB inlines CTEs per reference, so the signature
  // pipeline would otherwise recompute multiplicatively through the band
  // self-joins (the same re-evaluation hazard TextHash.let solves on the
  // Spark side) — measured minutes vs seconds on 500 docs
  private val shinglePrelude =
    s"""WITH sh AS MATERIALIZED (
       |  SELECT doc_id, list_distinct(${shingleHashes("th")}) AS shs
       |  FROM (SELECT doc_id, ${tokenHashes("text")} AS th FROM documents)),
       |sigs AS MATERIALIZED (
       |  SELECT doc_id, shs, ${minhashSig("shs", Dedup.MinhashK)} AS sig FROM sh),
       |bands AS MATERIALIZED (
       |  SELECT doc_id, band, ${(0 until Dedup.RowsPerBand)
            .foldLeft("CAST(17 AS BIGINT)") { (acc, k) =>
              s"(($acc)*131 + sig[CAST(band*${Dedup.RowsPerBand} + ${k + 1} AS INT)]) % $P"
            }} AS band_hash
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, ${Dedup.Bands})) AS band))
       |""".stripMargin

  val exact: String =
    """SELECT min(doc_id) AS rep_id, CAST(count(*) AS BIGINT) AS n_copies,
      |       md5(lower(trim(text))) AS fp
      |FROM documents GROUP BY md5(lower(trim(text)))
      |ORDER BY rep_id""".stripMargin

  val ngramJaccard: String =
    shinglePrelude +
      s""", ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |       CAST(count(*) AS BIGINT) AS n_common,
         |       round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 6) AS jaccard
         |FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id, a.n, b.n
         |ORDER BY jaccard DESC, id1, id2
         |LIMIT 20""".stripMargin

  /** Brute formulation of the τ = 4/5 exact similarity join — deliberately
    * structurally different from the engine's prefix-filtered plan (shared-
    * shingle grouping, no prefix index), so the comparison checks the
    * candidate scheme's completeness, not a shared shape. The threshold is
    * the integer cross-multiplication 9c ≥ 4(n1+n2) in both engines. */
  val prefixFilter: String =
    shinglePrelude +
      s""", ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2,
         |         CAST(a.n AS BIGINT) AS n1, CAST(b.n AS BIGINT) AS n2,
         |         CAST(count(*) AS BIGINT) AS n_common
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n, b.n)
         |SELECT id1, id2, n1, n2, n_common,
         |       round(CAST(n_common AS DOUBLE) / (n1 + n2 - n_common), 6) AS jaccard
         |FROM pairs
         |WHERE n_common * ${Dedup.PrefixTauNum + Dedup.PrefixTauDen} >=
         |      (n1 + n2) * ${Dedup.PrefixTauNum}
         |ORDER BY jaccard DESC, id1, id2""".stripMargin

  val minhashBands: String =
    shinglePrelude +
      """SELECT doc_id, CAST(band AS INT) AS band, band_hash FROM bands
        |ORDER BY doc_id, band""".stripMargin

  val minhashPairs: String =
    shinglePrelude +
      s""", cand AS (
         |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id)
         |SELECT id1, id2,
         |  round(CAST(len(list_filter(range(1, ${Dedup.MinhashK + 1}),
         |    i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / ${Dedup.MinhashK}, 6) AS est_sim,
         |  round(CAST(len(list_intersect(s1.shs, s2.shs)) AS DOUBLE) /
         |    len(list_distinct(list_concat(s1.shs, s2.shs))), 6) AS jaccard
         |FROM cand JOIN sigs s1 ON cand.id1 = s1.doc_id
         |          JOIN sigs s2 ON cand.id2 = s2.doc_id
         |ORDER BY est_sim DESC, id1, id2""".stripMargin

  /** Connected components over the thresholded candidate graph via a
    * recursive-CTE transitive closure (UNION dedups rows, so the
    * recursion reaches the reachability fixpoint and stops); cluster id =
    * min reachable doc_id. Cross-checks Dedup.clusters' iterative
    * min-label propagation against an independent fixpoint formulation. */
  private val compPrelude: String =
    "WITH RECURSIVE" + shinglePrelude.stripPrefix("WITH") +
      s""", cand AS (
         |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |edges AS (
         |  SELECT id1, id2 FROM (
         |    SELECT cand.id1, cand.id2,
         |      CAST(len(list_filter(range(1, ${Dedup.MinhashK + 1}),
         |        i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / ${Dedup.MinhashK} AS est_sim
         |    FROM cand JOIN sigs s1 ON cand.id1 = s1.doc_id
         |              JOIN sigs s2 ON cand.id2 = s2.doc_id)
         |  WHERE est_sim >= ${Dedup.MinClusterSim}),
         |undirected AS MATERIALIZED (
         |  -- MATERIALIZED: the recursive term re-evaluates referenced CTEs
         |  -- per iteration; without this the whole shingle/signature
         |  -- prelude recomputes every round
         |  SELECT id1 AS src, id2 AS dst FROM edges
         |  UNION SELECT id2, id1 FROM edges),
         |reach AS (
         |  SELECT src, src AS dst FROM undirected
         |  UNION
         |  SELECT r.src, u.dst FROM reach r JOIN undirected u ON r.dst = u.src),
         |comp AS (
         |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
         |""".stripMargin

  val clusters: String =
    compPrelude +
      """SELECT doc_id, cluster_id,
        |       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
        |FROM comp
        |ORDER BY cluster_id, doc_id""".stripMargin

  /** Canonical pick per cluster: max quality score, ties → min doc_id —
    * same two-level max-then-min shape as the Spark side (score equality
    * is bit-exact: both engines compute the identical rounded per-row
    * score, and MAX selects one of those values). */
  val canonical: String =
    compPrelude.stripSuffix("\n") +
      s""", scored AS (
         |  SELECT doc_id,
         |         round((CAST(len(list_distinct(t.toks)) AS DOUBLE) / len(t.toks))
         |               * ln(1.0 + len(t.toks)), 6) AS score
         |  FROM (SELECT doc_id, ${tokens("text")} AS toks FROM documents) t),
         |j AS (SELECT comp.cluster_id, comp.doc_id, scored.score
         |      FROM comp JOIN scored USING (doc_id)),
         |best AS (SELECT cluster_id, MAX(score) AS best_score,
         |                CAST(COUNT(*) AS BIGINT) AS n_members
         |         FROM j GROUP BY cluster_id)
         |SELECT b.cluster_id, MIN(j.doc_id) AS canonical_id, b.best_score, b.n_members
         |FROM j JOIN best b ON j.cluster_id = b.cluster_id AND j.score = b.best_score
         |GROUP BY b.cluster_id, b.best_score, b.n_members
         |ORDER BY b.cluster_id""".stripMargin

  /** Survivor census after near-dup application: unclustered docs + each
    * cluster's canonical pick, per language. */
  val applyNear: String =
    compPrelude.stripSuffix("\n") +
      s""", scored AS (
         |  SELECT doc_id,
         |         round((CAST(len(list_distinct(t.toks)) AS DOUBLE) / len(t.toks))
         |               * ln(1.0 + len(t.toks)), 6) AS score
         |  FROM (SELECT doc_id, ${tokens("text")} AS toks FROM documents) t),
         |j AS (SELECT comp.cluster_id, comp.doc_id, scored.score
         |      FROM comp JOIN scored USING (doc_id)),
         |best AS (SELECT cluster_id, MAX(score) AS best_score
         |         FROM j GROUP BY cluster_id),
         |can AS (SELECT b.cluster_id, MIN(j.doc_id) AS canonical_id
         |        FROM j JOIN best b
         |          ON j.cluster_id = b.cluster_id AND j.score = b.best_score
         |        GROUP BY b.cluster_id),
         |dropped AS (SELECT doc_id FROM comp
         |            WHERE doc_id NOT IN (SELECT canonical_id FROM can))
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(length(text)) AS BIGINT) AS n_chars
         |FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |GROUP BY lang
         |ORDER BY lang""".stripMargin

  /** Blocking-FREE brute force over all doc pairs at hamming ≤ 3 — an
    * independent check that the Spark side's slice-blocked LSH join loses
    * no pair within the threshold (Dedup.MaxHamming pigeonhole bound). */
  val simhashPairs: String =
    s"""WITH s AS MATERIALIZED (
       |  SELECT doc_id, ${simhash32("th")} AS sh
       |  FROM (SELECT doc_id, ${tokenHashes("text")} AS th FROM documents))
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |       ${hamming("a.sh", "b.sh")} AS hamming_dist
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE ${hamming("a.sh", "b.sh")} <= ${graft.dedup.Dedup.MaxHamming}
       |ORDER BY hamming_dist, id1, id2
       |LIMIT 20""".stripMargin

  val embeddingNearDup: String =
    s"""WITH np AS (${annPlanesCte("embeddings")}),
       |e AS (
       |  SELECT vec_id, embedding,
       |         ${lshBucketDyn("embedding", 64, "(SELECT planes FROM np)")} AS bucket
       |  FROM embeddings)
       |SELECT a.vec_id AS id1, b.vec_id AS id2, a.bucket AS bucket,
       |       round(${cosine("a.embedding", "b.embedding")}, 6) AS cos_sim
       |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |ORDER BY cos_sim DESC, id1, id2
       |LIMIT 20""".stripMargin

  val applyExact: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |       CAST(SUM(length(text)) AS BIGINT) AS n_chars
      |FROM documents
      |WHERE doc_id IN (
      |  SELECT min(doc_id) FROM documents GROUP BY md5(lower(trim(text))))
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val incremental: String =
    """WITH fps AS (
      |  SELECT doc_id, md5(lower(trim(text))) AS fp, doc_id % 5 = 0 AS is_new
      |  FROM documents),
      |old_fps AS (SELECT DISTINCT fp FROM fps WHERE NOT is_new)
      |SELECT MIN(doc_id) AS doc_id, fp, CAST(COUNT(*) AS BIGINT) AS n_in_batch
      |FROM fps
      |WHERE is_new AND fp NOT IN (SELECT fp FROM old_fps)
      |GROUP BY fp
      |ORDER BY doc_id""".stripMargin

  val minhashSweep: String = {
    val ts = Dedup.SweepThresholds.mkString("[", ", ", "]")
    s"""WITH pairs AS (SELECT id1, id2, est_sim FROM ($minhashPairs)),
       |swept AS (SELECT id1, id2, est_sim, unnest($ts) AS threshold FROM pairs),
       |surv AS (SELECT * FROM swept WHERE est_sim >= threshold),
       |pc AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs
       |       FROM surv GROUP BY threshold),
       |dc AS (SELECT threshold, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
       |         AS n_docs_touched
       |       FROM (SELECT threshold, id1 AS doc_id FROM surv
       |             UNION ALL SELECT threshold, id2 FROM surv)
       |       GROUP BY threshold)
       |SELECT threshold, n_pairs, n_docs_touched
       |FROM pc JOIN dc USING (threshold)
       |ORDER BY threshold""".stripMargin
  }

  /** Distinct new×standing candidate pairs — the bucketed probe's logical
    * result, independent of the physical landing. */
  val standingProbe: String =
    shinglePrelude +
      s"""SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.band_hash = y.band_hash
         |WHERE x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0
         |ORDER BY new_id, old_id""".stripMargin

  /** New-batch-probes-standing-index candidates with closest-match pick
    * (max agreement, ties → lowest standing id). */
  val incrementalMinhash: String =
    shinglePrelude +
      s""", cand AS (
         |  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash
         |  WHERE x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0),
         |scored AS (
         |  SELECT new_id, old_id,
         |    round(CAST(len(list_filter(range(1, ${Dedup.MinhashK + 1}),
         |      i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / ${Dedup.MinhashK}, 6)
         |      AS est_sim
         |  FROM cand JOIN sigs s1 ON cand.new_id = s1.doc_id
         |            JOIN sigs s2 ON cand.old_id = s2.doc_id),
         |best AS (
         |  SELECT new_id, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |         MAX(est_sim) AS max_est_sim
         |  FROM scored GROUP BY new_id)
         |SELECT b.new_id, b.n_candidates, b.max_est_sim,
         |       MIN(s.old_id) AS closest_old_id
         |FROM scored s JOIN best b
         |  ON s.new_id = b.new_id AND s.est_sim = b.max_est_sim
         |GROUP BY b.new_id, b.n_candidates, b.max_est_sim
         |ORDER BY b.new_id""".stripMargin

  /** Containment both-directions max + jaccard over the banded
    * candidates — mirrors Dedup.containmentPairs. */
  val containmentPairs: String =
    shinglePrelude +
      s""", cand AS (
         |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |m AS (
         |  SELECT id1, id2,
         |    CAST(len(s1.shs) AS BIGINT) AS n1,
         |    CAST(len(s2.shs) AS BIGINT) AS n2,
         |    CAST(len(list_intersect(s1.shs, s2.shs)) AS BIGINT) AS n_common
         |  FROM cand JOIN sigs s1 ON cand.id1 = s1.doc_id
         |            JOIN sigs s2 ON cand.id2 = s2.doc_id)
         |SELECT id1, id2, n1, n2, n_common,
         |  round(CAST(n_common AS DOUBLE) / least(n1, n2), 6) AS containment,
         |  round(CAST(n_common AS DOUBLE) / (n1 + n2 - n_common), 6) AS jaccard
         |FROM m
         |ORDER BY containment DESC, id1, id2
         |LIMIT 20""".stripMargin

  /** Source-pair overlap census over the candidate pairs with 6-dp
    * quantized similarity mass. */
  val sourceOverlap: String =
    s"""WITH pairs AS (SELECT * FROM ($minhashPairs)),
       |src AS (SELECT doc_id, source FROM documents)
       |SELECT least(a.source, b.source) AS source_a,
       |       greatest(a.source, b.source) AS source_b,
       |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |       CAST(SUM(CAST(floor(est_sim * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
       |         AS sim_sum_q
       |FROM pairs JOIN src a ON a.doc_id = id1 JOIN src b ON b.doc_id = id2
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Components over the UNTHRESHOLDED candidate graph (the split gate
    * must merge every pair the audit checks) + the split hash on the
    * representative — the recursive-CTE cross-check of
    * Dedup.splitClustered's label fixpoint. */
  val splitClustered: String = {
    val h = s"(${strHash("'split:' || CAST(rep_id AS VARCHAR)")} % 100)"
    "WITH RECURSIVE" + shinglePrelude.stripPrefix("WITH") +
      s""", cand AS (
         |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |undirected AS MATERIALIZED (
         |  SELECT id1 AS src, id2 AS dst FROM cand
         |  UNION SELECT id2, id1 FROM cand),
         |reach AS (
         |  SELECT src, src AS dst FROM undirected
         |  UNION
         |  SELECT r.src, u.dst FROM reach r JOIN undirected u ON r.dst = u.src),
         |comp AS (
         |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
         |rep AS (
         |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS rep_id
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
         |SELECT doc_id, rep_id,
         |       CASE WHEN $h < 80 THEN 'train'
         |            WHEN $h < 90 THEN 'valid'
         |            ELSE 'test' END AS split
         |FROM rep
         |ORDER BY doc_id""".stripMargin
  }

  val splitLeakage: String = {
    val h = s"(${strHash("'split:' || CAST(doc_id AS VARCHAR)")} % 100)"
    s"""WITH pairs AS (SELECT * FROM ($minhashPairs)),
       |sp AS (
       |  SELECT doc_id, CASE WHEN $h < 80 THEN 'train'
       |                      WHEN $h < 90 THEN 'valid'
       |                      ELSE 'test' END AS split
       |  FROM documents)
       |SELECT id1, id2, a.split AS split1, b.split AS split2,
       |       est_sim, jaccard
       |FROM pairs JOIN sp a ON a.doc_id = id1 JOIN sp b ON b.doc_id = id2
       |WHERE a.split <> b.split
       |ORDER BY est_sim DESC, id1, id2""".stripMargin
  }

  // exact pair overlap + the sketch gate (Spark computes the estimate;
  // the oracle pins the exact counts and asserts the gate held)
  def thetaOverlap: String =
    s"""WITH docsh AS MATERIALIZED (
       |  SELECT source, unnest(list_distinct(${shingleHashes("th")})) AS h
       |  FROM (SELECT source, ${tokenHashes("text")} AS th FROM documents)),
       |sh AS (SELECT DISTINCT source, h FROM docsh),
       |srcs AS (SELECT DISTINCT source FROM documents),
       |ov AS (
       |  SELECT s1.source AS source_a, s2.source AS source_b,
       |         CAST(COUNT(*) AS BIGINT) AS n_overlap
       |  FROM sh s1 JOIN sh s2 ON s1.h = s2.h AND s1.source < s2.source
       |  GROUP BY 1, 2)
       |SELECT p.source_a, p.source_b,
       |       COALESCE(ov.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
       |       TRUE AS est_ok
       |FROM (SELECT a.source AS source_a, b.source AS source_b
       |      FROM srcs a JOIN srcs b ON a.source < b.source) p
       |LEFT JOIN ov ON p.source_a = ov.source_a AND p.source_b = ov.source_b
       |ORDER BY 1, 2""".stripMargin

  /** Duplicated-substring span report (ExactSubstr signal): positional
    * (non-distinct) 3-gram shingles via zipped unnest (parallel unnests
    * expand in lockstep, and an empty shingle list yields no rows — both
    * matching Spark's posexplode). */
  val dupSpans: String =
    s"""WITH pos AS MATERIALIZED (
       |  SELECT doc_id, unnest(range(0, len(shs))) AS pos, unnest(shs) AS s
       |  FROM (SELECT doc_id, ${shingleHashes("th")} AS shs
       |        FROM (SELECT doc_id, ${tokenHashes("text")} AS th FROM documents))),
       |freq AS (SELECT s, COUNT(*) AS occ FROM pos GROUP BY s),
       |flagged AS (
       |  SELECT p.doc_id, p.pos, (f.occ >= 2) AS dup
       |  FROM pos p JOIN freq f USING (s)),
       |runs AS (
       |  SELECT doc_id, MAX(run) AS max_run FROM (
       |    SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS run FROM (
       |      SELECT doc_id,
       |             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |      FROM flagged WHERE dup)
       |    GROUP BY doc_id, grp)
       |  GROUP BY doc_id)
       |SELECT g.doc_id, g.n_pos, g.n_dup_pos,
       |       round(CAST(g.n_dup_pos AS DOUBLE) / g.n_pos, 6) AS dup_share,
       |       CAST(COALESCE(r.max_run, 0) AS BIGINT) AS max_run
       |FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pos,
       |             CAST(COUNT(*) FILTER (WHERE dup) AS BIGINT) AS n_dup_pos
       |      FROM flagged GROUP BY doc_id) g
       |LEFT JOIN runs r USING (doc_id)
       |ORDER BY dup_share DESC, doc_id""".stripMargin

  /** Benchmark decontamination: the eval side slices the token-hash list
    * directly (th[7:18] ≡ Spark's rejoin-then-retokenize of tokens 7..18 —
    * single-space joins round-trip through the \s+ tokenizer). */
  val decontaminate: String =
    s"""WITH th AS MATERIALIZED (
       |  SELECT doc_id, ${tokenHashes("text")} AS th FROM documents),
       |tg AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(${shingleHashes("th", Dedup.DecontamN)})) AS g
       |  FROM th),
       |ev AS (SELECT doc_id + 2000000 AS eval_id, th[7:18] AS th2
       |       FROM th WHERE doc_id % 25 = 0),
       |eg AS (
       |  SELECT eval_id,
       |         unnest(list_distinct(${shingleHashes("th2", Dedup.DecontamN)})) AS g
       |  FROM ev)
       |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams,
       |       CAST(COUNT(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs
       |FROM tg t JOIN eg e USING (g)
       |GROUP BY t.doc_id
       |ORDER BY n_shared_ngrams DESC, doc_id""".stripMargin

  /** Recall of the banded candidates against the exact-Jaccard truth at
    * integer-cross-multiplied thresholds. */
  val lshRecall: String =
    shinglePrelude +
      s""", ex AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh),
         |truth AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2,
         |         CAST(a.n AS BIGINT) AS n1, CAST(b.n AS BIGINT) AS n2,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n, b.n),
         |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.band_hash = y.band_hash
         |          AND x.doc_id < y.doc_id),
         |taus AS (SELECT unnest([1, 2, 3]) AS t10)
         |SELECT CAST(t10 AS DOUBLE) / 10 AS tau,
         |       CAST(COUNT(*) AS BIGINT) AS n_truth,
         |       CAST(SUM(CASE WHEN c2.id1 IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_detected,
         |       round(CAST(SUM(CASE WHEN c2.id1 IS NOT NULL THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM truth t LEFT JOIN cand c2 ON c2.id1 = t.id1 AND c2.id2 = t.id2
         |CROSS JOIN taus
         |WHERE t.c * 10 >= t10 * (t.n1 + t.n2 - t.c)
         |GROUP BY t10
         |ORDER BY tau""".stripMargin

  /** Per-source before/after census under global min-doc_id dedup. */
  val dedupImpact: String =
    """WITH d AS (SELECT doc_id, source, n_chars,
      |             md5(lower(trim(text))) AS fp FROM documents),
      |k AS (SELECT source, n_chars,
      |        row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS keep
      |      FROM d)
      |SELECT source,
      |       CAST(COUNT(*) AS BIGINT) AS docs_total,
      |       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
      |       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
      |       CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
      |         AS chars_kept,
      |       round(1.0 - CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
      |             / COUNT(*), 6) AS doc_removal_rate
      |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** Soft-dedup loss weights: cluster sizes from the same recursive
    * component closure as [[clusters]]; per-doc weight 1000 // m in
    * integer milli-units so the source sums are exact, mirroring
    * Dedup.softWeights structurally. */
  val softWeights: String =
    compPrelude.stripSuffix("\n") +
      s""", sizes AS (SELECT cluster_id, COUNT(*) AS m FROM comp GROUP BY cluster_id),
         |mem AS (SELECT comp.doc_id, sizes.m FROM comp JOIN sizes USING (cluster_id)),
         |d AS (SELECT doc_id, source,
         |             CAST(len(${tokens("text")}) AS BIGINT) AS n_toks
         |      FROM documents),
         |w AS (SELECT d.source, d.n_toks, COALESCE(mem.m, 1) AS mm,
         |             CAST(1000 // COALESCE(mem.m, 1) AS BIGINT) AS w_milli
         |      FROM d LEFT JOIN mem USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN mm > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |       CAST(SUM(n_toks) AS BIGINT) AS tokens_raw,
         |       CAST(SUM(n_toks * w_milli) AS BIGINT) AS tokens_eff_milli,
         |       round(CAST(SUM(n_toks * w_milli) AS DOUBLE)
         |             / NULLIF(SUM(n_toks) * 1000, 0), 6) AS keep_ratio
         |FROM w GROUP BY source ORDER BY source""".stripMargin

  val all: Map[String, String] = Map(
    "dedup_soft_weights" -> softWeights,
    "dedup_lsh_recall" -> lshRecall,
    "dedup_impact" -> dedupImpact,
    "dedup_dup_spans" -> dupSpans,
    "dedup_decontaminate" -> decontaminate,
    "dedup_theta_overlap" -> thetaOverlap,
    "dedup_apply_near" -> applyNear,
    "dedup_standing_probe" -> standingProbe,
    "dedup_incremental_minhash" -> incrementalMinhash,
    "dedup_containment" -> containmentPairs,
    "dedup_source_overlap" -> sourceOverlap,
    "dedup_split_clustered" -> splitClustered,
    "dedup_minhash_sweep" -> minhashSweep,
    "dedup_incremental" -> incremental,
    "dedup_apply_exact" -> applyExact,
    "dedup_canonical" -> canonical,
    "dedup_clusters" -> clusters,
    "dedup_exact" -> exact,
    "dedup_prefix_filter" -> prefixFilter,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_minhash_bands" -> minhashBands,
    "dedup_minhash_pairs" -> minhashPairs,
    "dedup_split_leakage" -> splitLeakage,
    "dedup_simhash" -> simhashPairs,
    "dedup_embedding_neardup" -> embeddingNearDup)
}
