package graft.queries

/** DuckDB oracle SQL for the queries whose INPUTS are engine-generated
  * (synthetic pages corpus) or whose logic needs non-ANSI DuckDB
  * list/regex machinery. Two patterns:
  *
  *   1. `{OUT}`-anchored: Verify dumps a deterministic upstream relation
  *      (hyperlinks, blocking keys, per-case counter rows — each
  *      golden-tested against the reference) as parquet next to the query
  *      results, and the oracle recomputes the query's downstream
  *      aggregation/join/window logic from that dump in a second engine.
  *   2. Direct: the query reads the sf tables (documents/embeddings), so
  *      the oracle re-expresses the full computation in DuckDB SQL — the
  *      rolling-hash fingerprint runs as HUGEINT list_reduce arithmetic,
  *      ANN brute-force as a cross join + window, language ID / quality /
  *      token counts as list/regex pipelines.
  *
  * Numeric discipline: BIGINT-only outputs wherever feasible (DuckDB sums
  * return HUGEINT — outer casts); ta_quality is the one double-valued
  * oracle, exact because both engines evaluate the identical IEEE
  * expression tree left-associatively.
  */
object AuxOracles {

  val kbLinkFreqSql: String =
    """SELECT norm_text AS link_text, target AS entity_id, count(*) AS freq
      |FROM '{OUT}/aux_hyperlinks/*.parquet' GROUP BY 1, 2""".stripMargin

  val kbTopCandidatesSql: String =
    """WITH lf AS (SELECT norm_text AS link_text, target AS entity_id, count(*) AS freq
      |            FROM '{OUT}/aux_hyperlinks/*.parquet' GROUP BY 1, 2),
      |rk AS (SELECT link_text, entity_id, freq,
      |              rank() OVER (PARTITION BY link_text ORDER BY freq DESC) AS rnk FROM lf)
      |SELECT link_text, string_agg(DISTINCT entity_id, ',' ORDER BY entity_id) AS candidates,
      |       CAST(max(freq) AS BIGINT) AS freq
      |FROM rk WHERE rnk = 1 GROUP BY link_text""".stripMargin

  /** kb_alias_probs replay: per-alias candidate probabilities from the
    * hyperlink dump. DOUBLE-valued but exact: both engines divide the
    * same two integers in IEEE double (ta_quality precedent). */
  val kbAliasProbsSql: String =
    """WITH lf AS (SELECT norm_text AS alias, target AS entity_id, count(*) AS freq
      |            FROM '{OUT}/aux_hyperlinks/*.parquet' GROUP BY 1, 2),
      |tot AS (SELECT alias, sum(freq) AS total, count(*) AS n FROM lf GROUP BY alias)
      |SELECT lf.alias, lf.entity_id,
      |       CASE WHEN tot.total > 0 THEN CAST(lf.freq AS DOUBLE) / CAST(tot.total AS DOUBLE)
      |            ELSE 1.0 / CAST(tot.n AS DOUBLE) END AS prob
      |FROM lf JOIN tot ON lf.alias = tot.alias
      |WHERE length(lf.alias) > 0""".stripMargin

  val evalOracleCountsSql: String =
    """SELECT mode, category, CAST(sum(tp) AS BIGINT) AS tp, CAST(sum(fp) AS BIGINT) AS fp,
      |       CAST(sum(fn) AS BIGINT) AS fn
      |FROM '{OUT}/aux_oracle_counter_rows/*.parquet' GROUP BY mode, category""".stripMargin

  val evalBaselineCountsSql: String =
    """SELECT mode, category, CAST(sum(tp) AS BIGINT) AS tp, CAST(sum(fp) AS BIGINT) AS fp,
      |       CAST(sum(fn) AS BIGINT) AS fn
      |FROM '{OUT}/aux_baseline_counter_rows/*.parquet' GROUP BY mode, category""".stripMargin

  /** Discrete p99 (smallest size covering >= ceil(0.99 * n_blocks) blocks)
    * via the distinct-size histogram — integer-exact, mirrors
    * Blocking.blockProfile. */
  val erBlockProfileSql: String =
    """WITH bs AS (SELECT key, count(*) AS block_size
      |            FROM '{OUT}/aux_block_keys/*.parquet' GROUP BY key),
      |g AS (SELECT block_size, count(*) AS c FROM bs GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
      |               CAST(max(block_size) AS BIGINT) AS max_block,
      |               CAST(sum((block_size * (block_size - 1)) // 2) AS BIGINT) AS naive_pairs
      |        FROM bs),
      |cum AS (SELECT g1.block_size AS bs2, sum(g2.c) AS cc
      |        FROM g g1 JOIN g g2 ON g2.block_size <= g1.block_size
      |        GROUP BY g1.block_size),
      |p99 AS (SELECT CAST(min(cum.bs2) AS BIGINT) AS p99_block FROM cum, tot
      |        WHERE cum.cc >= (99 * tot.n_blocks + 99) // 100)
      |SELECT n_blocks, max_block, p99_block, naive_pairs FROM tot, p99""".stripMargin

  val taTokenCountsSql: String =
    """SELECT doc_id,
      |  CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
      |  CAST(coalesce(list_sum(list_transform(list_filter(
      |         regexp_split_to_array(text, '[^\p{L}\p{N}]+'), w -> w <> ''),
      |         w -> (length(w) + 3) // 4)), 0)
      |       + length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS BIGINT) AS bpeish_tokens
      |FROM documents""".stripMargin

  /** The exact Character.isWhitespace set as an RE2 class — RE2's `\s` is
    * ASCII-only, so a Unicode space (em-space, line separator …) would
    * diverge from the engine and fail the gate on a correct answer.
    * isWhitespace = 09-0D, 1C-1F, space, OGHAM, the breaking 2000-200A
    * range (2007 figure space excluded), 2028/2029, 205F, 3000. */
  private val WsClass =
    """[\t-\r\x{1c}-\x{1f} \x{1680}\x{2000}-\x{2006}\x{2008}-\x{200a}\x{2028}\x{2029}\x{205f}\x{3000}]"""

  /** The FNV-style rolling fingerprint as HUGEINT arithmetic: fold
    * (xor(h, c) * prime) mod 2^64 over the normalized text's code units,
    * then map the unsigned result back to the signed BIGINT Spark emits.
    * Residual declared divergence: DuckDB lower() is full-string Unicode
    * (e.g. U+0130 expands to two code points) vs the engine's per-char
    * Character.toLowerCase — identical on everything but a handful of
    * special-casing letters. */
  val taFingerprintSql: String =
    s"""SELECT doc_id, CAST(CASE WHEN h >= 9223372036854775808
      |                         THEN h - 18446744073709551616 ELSE h END AS BIGINT) AS fingerprint
      |FROM (SELECT doc_id, list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), units),
      |        (a, b) -> (xor(a, b) * 1099511628211) % 18446744073709551616) AS h
      |      FROM (SELECT doc_id,
      |              -- the engine folds UTF-16 CODE UNITS (String.charAt);
      |              -- DuckDB indexes code points, so astral chars expand to
      |              -- their surrogate pair before the fold
      |              flatten(list_transform(range(1, length(norm) + 1), i ->
      |                CASE WHEN unicode(substr(norm, i, 1)) < 65536
      |                     THEN [CAST(unicode(substr(norm, i, 1)) AS HUGEINT)]
      |                     ELSE [CAST(55296 + ((unicode(substr(norm, i, 1)) - 65536) // 1024) AS HUGEINT),
      |                           CAST(56320 + ((unicode(substr(norm, i, 1)) - 65536) % 1024) AS HUGEINT)]
      |                END)) AS units
      |            FROM (SELECT doc_id,
      |              regexp_replace(regexp_replace(regexp_replace(lower(text),
      |                '$WsClass', ' ', 'g'), ' +', ' ', 'g'), '^ ', '') AS norm
      |            FROM documents)))""".stripMargin

  val taLangidSql: String = {
    val en = "['the','of','and','to','in','is','was','that','for','with','as','his','her']"
    val de = "['der','die','das','und','ist','von','mit','ein','eine','nicht','auf','für','im']"
    val es = "['el','la','los','las','de','que','y','en','un','una','es','por','con']"
    val fr = "['le','la','les','de','des','et','est','un','une','dans','que','pour','qui']"
    // whitespace via the exact isWhitespace class (see WsClass), and the
    // CJK count over the engine's exact UnicodeBlocks (base
    // CJK_UNIFIED_IDEOGRAPHS + kana) — RE2's \p{Han} also matches
    // extensions/compatibility blocks the engine does not count
    raw"""WITH t AS (
       |  SELECT doc_id,
       |    list_transform(list_filter(regexp_split_to_array(text,
       |      '[^\p{L}\p{Nd}_'']+'), w -> w <> ''), w -> lower(w)) AS toks,
       |    length(regexp_replace(text, '$WsClass', '', 'g')) AS total,
       |    length(regexp_replace(text,
       |      '[^\x{4e00}-\x{9fff}\x{3040}-\x{309f}\x{30a0}-\x{30ff}]', '', 'g')) AS cjk
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, toks, total, cjk,
       |    length(list_filter(toks, w -> list_contains($en, w))) AS s_en,
       |    length(list_filter(toks, w -> list_contains($de, w))) AS s_de,
       |    length(list_filter(toks, w -> list_contains($es, w))) AS s_es,
       |    length(list_filter(toks, w -> list_contains($fr, w))) AS s_fr
       |  FROM t)
       |SELECT doc_id,
       |  CASE WHEN total > 0 AND cjk * 1.0 / total > 0.25 THEN 'zh'
       |       WHEN length(toks) = 0 THEN 'und'
       |       WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
       |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
       |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
       |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
       |       ELSE 'fr' END AS predicted_lang
       |FROM s""".stripMargin
  }

  val taQualitySql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(text, '\s+') AS toks,
      |    CAST(length(text) AS DOUBLE) AS n_chars,
      |    CAST(length(regexp_replace(text, '[^\p{L}\p{N}]', '', 'g')) AS DOUBLE) AS n_alnum,
      |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digit
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, toks, n_chars, n_alnum, n_digit,
      |    CAST(length(toks) AS DOUBLE) AS n_tok,
      |    CAST(length(list_filter(toks, w -> list_contains(
      |      ['the','of','and','to','in','is','was','that','for','with','as','his','her'],
      |      lower(w)))) AS DOUBLE) AS n_stop,
      |    CASE WHEN length(toks) = 0 THEN 0.0
      |         ELSE CAST(list_max(list_transform(list_distinct(toks),
      |                d -> length(list_filter(toks, w -> w = d)))) AS DOUBLE)
      |              / CAST(length(toks) AS DOUBLE) END AS top_tok_share,
      |    CASE WHEN length(toks) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
      |              / CAST(length(toks) AS DOUBLE) END AS mean_word_len
      |  FROM b)
      |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
      |  greatest(0.0, least(1.0,
      |    0.35 * (CASE WHEN n_chars = 0 THEN 0.0 ELSE n_alnum / n_chars END)
      |    + 0.25 * least((CASE WHEN n_tok = 0 THEN 0.0 ELSE n_stop / n_tok END) * 4, 1.0)
      |    + 0.2 * (CASE WHEN mean_word_len BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.3 END)
      |    + 0.2 * (1.0 - top_tok_share)
      |    - 0.3 * (CASE WHEN n_chars = 0 THEN 0.0 ELSE n_digit / n_chars END))) AS quality
      |FROM m""".stripMargin

  /** Repetition-counter CTEs shared by taRepetitionSql and
    * taGopherFilterSql: the engine's per-row sorted-run folds (top
    * bigram/trigram count, duplicated-5-gram occurrences) re-derived
    * relationally — unnest the n-grams, group-count, max / filtered-sum
    * per doc. All integers, so the hash compare is exact. */
  private val repetitionCtes: String =
    """d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |b2 AS (SELECT doc_id, ng, count(*) AS c
      |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)), i ->
      |               toks[i] || ' ' || toks[i+1])) AS ng FROM d)
      |       GROUP BY doc_id, ng),
      |b3 AS (SELECT doc_id, ng, count(*) AS c
      |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i ->
      |               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ng FROM d)
      |       GROUP BY doc_id, ng),
      |b5 AS (SELECT doc_id, ng, count(*) AS c
      |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3), i ->
      |               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |               toks[i+3] || ' ' || toks[i+4])) AS ng FROM d)
      |       GROUP BY doc_id, ng),
      |t2 AS (SELECT doc_id, max(c) AS top2 FROM b2 GROUP BY doc_id),
      |t3 AS (SELECT doc_id, max(c) AS top3 FROM b3 GROUP BY doc_id),
      |d5 AS (SELECT doc_id, sum(c) FILTER (WHERE c > 1) AS dup5 FROM b5 GROUP BY doc_id),
      |reps AS (SELECT d.doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_bigrams,
      |  CAST(coalesce(t2.top2, 0) AS BIGINT) AS top_bigram_n,
      |  CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_trigrams,
      |  CAST(coalesce(t3.top3, 0) AS BIGINT) AS top_trigram_n,
      |  CAST(greatest(len(toks) - 4, 0) AS BIGINT) AS n_5grams,
      |  CAST(coalesce(d5.dup5, 0) AS BIGINT) AS dup_5gram_n
      |FROM d LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
      |LEFT JOIN d5 USING (doc_id))""".stripMargin

  val taRepetitionSql: String =
    s"""WITH $repetitionCtes
      |SELECT doc_id, n_tokens, n_bigrams, top_bigram_n, n_trigrams,
      |  top_trigram_n, n_5grams, dup_5gram_n
      |FROM reps""".stripMargin

  /** Gopher decision-table replay: the identical integer
    * cross-multiplication rules over the shared repetition CTEs plus the
    * documents.n_chars length column — booleans only, hash-exact. The
    * thresholds are interpolated from GopherFilter.Thresholds() itself
    * (one source of truth — a retune cannot silently desynchronize the
    * oracle), and `keep` reuses the rule columns via DuckDB lateral
    * column aliases. */
  def taGopherFilterSql: String = {
    val t = graft.curate.GopherFilter.Thresholds()
    s"""WITH $repetitionCtes
      |SELECT r.doc_id, r.n_tokens,
      |  (r.n_tokens >= ${t.minTokens} AND r.n_tokens <= ${t.maxTokens}) AS length_ok,
      |  (${t.minMeanWordChars} * r.n_tokens <= doc.n_chars
      |    AND doc.n_chars <= ${t.maxMeanWordChars} * r.n_tokens) AS word_len_ok,
      |  (r.n_bigrams = 0 OR r.top_bigram_n * 100 <= r.n_bigrams * ${t.topBigramPct}) AS top_bigram_ok,
      |  (r.n_trigrams = 0 OR r.top_trigram_n * 100 <= r.n_trigrams * ${t.topTrigramPct}) AS top_trigram_ok,
      |  (r.n_5grams = 0 OR r.dup_5gram_n * 100 <= r.n_5grams * ${t.dup5gramPct}) AS dup_5gram_ok,
      |  (length_ok AND word_len_ok AND top_bigram_ok
      |    AND top_trigram_ok AND dup_5gram_ok) AS keep
      |FROM reps r JOIN documents doc USING (doc_id)""".stripMargin
  }

  /** Character-fraction Gopher replay (ta_gopher_charfrac): char-mass
    * numerators re-derived relationally from the shared repetition CTEs —
    * top n-gram char mass = max(count × length(ngram)), duplicated-5-gram
    * char mass = sum(count × length(ngram)) over counts > 1 (both count
    * code points, as the engine's length() does) — then the identical
    * integer cross-multiplication rules against documents.n_chars.
    * Thresholds interpolated from GopherFilter.CharThresholds(). */
  def taGopherCharfracSql: String = {
    val t = graft.curate.GopherFilter.CharThresholds()
    s"""WITH $repetitionCtes,
      |t2c AS (SELECT doc_id, max(c * length(ng)) AS topc FROM b2 GROUP BY doc_id),
      |t3c AS (SELECT doc_id, max(c * length(ng)) AS topc FROM b3 GROUP BY doc_id),
      |d5c AS (SELECT doc_id, sum(c * length(ng)) FILTER (WHERE c > 1) AS dupc FROM b5 GROUP BY doc_id)
      |SELECT r.doc_id, r.n_tokens,
      |  (r.n_tokens >= ${t.minTokens} AND r.n_tokens <= ${t.maxTokens}) AS length_ok,
      |  (${t.minMeanWordChars} * r.n_tokens <= doc.n_chars
      |    AND doc.n_chars <= ${t.maxMeanWordChars} * r.n_tokens) AS word_len_ok,
      |  (doc.n_chars = 0 OR coalesce(t2c.topc, 0) * 100 <= doc.n_chars * ${t.topBigramCharPct}) AS top_bigram_ok,
      |  (doc.n_chars = 0 OR coalesce(t3c.topc, 0) * 100 <= doc.n_chars * ${t.topTrigramCharPct}) AS top_trigram_ok,
      |  (doc.n_chars = 0 OR coalesce(d5c.dupc, 0) * 100 <= doc.n_chars * ${t.dup5gramCharPct}) AS dup_5gram_ok,
      |  (length_ok AND word_len_ok AND top_bigram_ok
      |    AND top_trigram_ok AND dup_5gram_ok) AS keep
      |FROM reps r JOIN documents doc USING (doc_id)
      |LEFT JOIN t2c USING (doc_id) LEFT JOIN t3c USING (doc_id)
      |LEFT JOIN d5c USING (doc_id)""".stripMargin
  }

  /** Fused curation-pipeline replay (curate_pipeline): stage 1 from the
    * gated ta_gopher_filter dump; stage 2 re-derives survivors over the
    * stage-1 subset (exact groups recomputed, near/containment = the
    * gated pair dumps restricted to survivors — the engine's declared
    * semantics); stage 3 replays the per-source cap (splitmix64 HUGEINT)
    * over the dedup keepers. Verdict = first dropping stage. */
  /** The shared dedup-over-survivors + cap replay of both fused-pipeline
    * oracles, parameterized by the upstream-stage pieces (the
    * ivfTopkSqlWith shape — one copy of the label-propagation CC and the
    * splitmix cap chain, so a fix to either can never silently miss one
    * pipeline): `extraCtes` (extra stage inputs, e.g. the dc_decontam
    * dump), `s1Body` (the stage-1 survivor SELECT), `verdictCase` (the
    * full CASE expression), `extraJoins` (verdict-side LEFT JOINs). */
  private def curateCompositionSql(extraCtes: String, s1Body: String,
      verdictCase: String, extraJoins: String): String =
    s"""WITH RECURSIVE
      |gf AS (SELECT doc_id, keep FROM '{OUT}/ta_gopher_filter/*.parquet'),$extraCtes
      |s1 AS ($s1Body),
      |d AS (SELECT doc_id AS id, md5(text) AS h FROM documents JOIN s1 USING (doc_id)),
      |g AS (SELECT h, min(id) AS gmin, count(*) AS gsz FROM d GROUP BY h),
      |exact_e AS (SELECT d.id AS a, g.gmin AS b FROM d JOIN g ON d.h = g.h WHERE d.id <> g.gmin),
      |near_e AS (SELECT id_a AS a, id_b AS b FROM '{OUT}/dd_minhash_pairs/*.parquet'
      |           WHERE id_a IN (SELECT doc_id FROM s1) AND id_b IN (SELECT doc_id FROM s1)),
      |cont AS (SELECT doc_a, doc_b FROM '{OUT}/dd_containment_pairs/*.parquet'
      |         WHERE doc_a IN (SELECT doc_id FROM s1) AND doc_b IN (SELECT doc_id FROM s1)),
      |e AS (SELECT a, b FROM exact_e UNION SELECT a, b FROM near_e
      |      UNION SELECT doc_a AS a, doc_b AS b FROM cont),
      |und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
      |lab(n, m) AS (
      |  SELECT greatest(a, b) AS n, least(a, b) AS m FROM e
      |  UNION
      |  SELECT u.b AS n, l.m FROM lab l JOIN und u ON l.n = u.a WHERE l.m < u.b),
      |mn AS (SELECT n, min(m) AS m FROM lab GROUP BY n),
      |s2 AS (SELECT d.id AS doc_id FROM d LEFT JOIN mn ON d.id = mn.n
      |       WHERE coalesce(mn.m, d.id) = d.id),
      |hh AS (SELECT doc.doc_id, doc.source, ${splitmixInline("doc.doc_id")} AS z
      |       FROM documents doc JOIN s2 USING (doc_id)),
      |rr AS (SELECT doc_id, row_number() OVER (PARTITION BY source ORDER BY z) AS rnk FROM hh),
      |capk AS (SELECT doc_id FROM rr WHERE rnk <= ${TrainingDataQueries.SourceCapN})
      |SELECT doc.doc_id,
      |  $verdictCase AS verdict
      |FROM documents doc
      |LEFT JOIN gf ON doc.doc_id = gf.doc_id$extraJoins
      |LEFT JOIN s2 ON doc.doc_id = s2.doc_id
      |LEFT JOIN capk ON doc.doc_id = capk.doc_id""".stripMargin

  def curatePipelineSql: String = curateCompositionSql(
    extraCtes = "",
    s1Body = "SELECT doc_id FROM gf WHERE keep",
    verdictCase =
      """CASE WHEN gf.keep IS NOT TRUE THEN 'gopher'
        |       WHEN s2.doc_id IS NULL THEN 'dedup'
        |       WHEN capk.doc_id IS NULL THEN 'cap'
        |       ELSE 'keep' END""".stripMargin,
    extraJoins = "")

  /** 5-stage fused-pipeline replay (curate_pipeline_full): the
    * curate_pipeline composition extended with the eval-slice exclusion
    * and the independently-gated dc_decontam dump, in the engine's stage
    * order (eval → gopher → decontam → DEDUP over what remains → cap). */
  def curatePipelineFullSql: String = curateCompositionSql(
    extraCtes =
      "\ndcm AS (SELECT doc_id, contaminated FROM '{OUT}/dc_decontam/*.parquet'),",
    s1Body =
      """SELECT gf.doc_id FROM gf JOIN dcm USING (doc_id)
        |       WHERE gf.keep AND NOT dcm.contaminated""".stripMargin,
    verdictCase =
      s"""CASE WHEN doc.doc_id % ${TrainingDataQueries.DecontamEvalMod} = ${TrainingDataQueries.DecontamEvalRes} THEN 'eval'
         |       WHEN gf.keep IS NOT TRUE THEN 'gopher'
         |       WHEN dcm.contaminated THEN 'decontam'
         |       WHEN s2.doc_id IS NULL THEN 'dedup'
         |       WHEN capk.doc_id IS NULL THEN 'cap'
         |       ELSE 'keep' END""".stripMargin,
    extraJoins = "\nLEFT JOIN dcm ON doc.doc_id = dcm.doc_id")

  /** ANN recall replay: intersection of each approximate top-k with the
    * brute-force floor, recomputed from the three dumped top-k tables.
    * Non-circular: ann_brute_topk / ann_lsh_topk / ann_ivf_topk are each
    * independently oracle-gated (bounded-heap, signature and Lloyd
    * replays), so this derivation only trusts tables the gate already
    * proved hash-exact. */
  def annRecallSql: String =
    s"""WITH b AS (SELECT query_id, nbr_id FROM '{OUT}/ann_brute_topk/*.parquet'),
      |q AS (SELECT DISTINCT query_id FROM b),
      |l AS (SELECT query_id, nbr_id FROM '{OUT}/ann_lsh_topk/*.parquet'),
      |i AS (SELECT query_id, nbr_id FROM '{OUT}/ann_ivf_topk/*.parquet'),
      |lm AS (SELECT query_id, count(*) AS m FROM l JOIN b USING (query_id, nbr_id) GROUP BY 1),
      |im AS (SELECT query_id, count(*) AS m FROM i JOIN b USING (query_id, nbr_id) GROUP BY 1)
      |SELECT 'lsh' AS method, q.query_id,
      |  CAST(coalesce(lm.m, 0) AS BIGINT) AS n_matched, CAST(${TrainingDataQueries.AnnK} AS BIGINT) AS k
      |FROM q LEFT JOIN lm USING (query_id)
      |UNION ALL
      |SELECT 'ivf' AS method, q.query_id,
      |  CAST(coalesce(im.m, 0) AS BIGINT) AS n_matched, CAST(${TrainingDataQueries.AnnK} AS BIGINT) AS k
      |FROM q LEFT JOIN im USING (query_id)""".stripMargin

  /** Per-source cap replay: splitmix64(doc_id) regenerated in SQL as
    * HUGEINT limb arithmetic, kept = row_number ≤ 8 per source under the
    * UNSIGNED hash order (the engine compares sign-flipped Longs — the
    * identical order). splitmix64 is a bijection on the 64-bit domain and
    * doc_ids are distinct, so the ranking is tie-free and the engine's
    * threshold rule (h ≤ n-th smallest) equals rank ≤ n exactly. */
  def taSourceCapSql: String =
    s"""WITH h AS (SELECT doc_id, source, ${splitmixInline("doc_id")} AS z FROM documents),
       |r AS (SELECT doc_id, source,
       |        row_number() OVER (PARTITION BY source ORDER BY z) AS rnk FROM h)
       |SELECT doc_id, source, rnk <= ${TrainingDataQueries.SourceCapN} AS kept FROM r""".stripMargin

  /** Pair-universe replay: the self-join on the dumped SUB-BUCKETED
    * blocking relation reproduces the engine's candidate pairs exactly
    * (the skew sub-bucketing already happened upstream of the dump), and
    * DuckDB recomputes dedup, set-Jaccard over the sorted ctx hashes,
    * score, the match rule, and Levenshtein. jw is the single
    * engine-joined scalar (custom Jaro-Winkler — golden/property-tested
    * elsewhere); a LEFT join keeps any oracle-only pair alive as a NULL
    * mismatch instead of hiding it. */
  val erScoredPairsSql: String =
    """WITH k AS (SELECT bkey, id, ns, gold,
      |        CASE WHEN ctx = '' THEN CAST([] AS BIGINT[])
      |             ELSE list_transform(string_split(ctx, ','), x -> CAST(x AS BIGINT))
      |        END AS ctx
      |      FROM '{OUT}/aux_keyed/*.parquet'),
      |p AS (SELECT DISTINCT l.id AS a, r.id AS b, l.ns AS ns_a, r.ns AS ns_b,
      |             l.ctx AS ctx_a, r.ctx AS ctx_b, l.gold AS gold_a, r.gold AS gold_b
      |      FROM k l JOIN k r ON l.bkey = r.bkey AND l.id < r.id),
      |e AS (SELECT a, b, jw FROM '{OUT}/er_scored_pairs/*.parquet'),
      |s AS (SELECT p.a, p.b, p.gold_a, p.gold_b, e.jw, p.ns_a, p.ns_b,
      |        CASE WHEN length(list_distinct(list_concat(ctx_a, ctx_b))) = 0 THEN 0.0
      |             ELSE CAST(length(list_distinct(list_intersect(ctx_a, ctx_b))) AS DOUBLE)
      |                  / length(list_distinct(list_concat(ctx_a, ctx_b))) END AS jaccard
      |      FROM p LEFT JOIN e ON p.a = e.a AND p.b = e.b)
      |SELECT a, b, gold_a, gold_b, jw, jaccard,
      |       0.6 * jw + 0.4 * jaccard AS score,
      |       ((jw >= 0.92 AND 0.6 * jw + 0.4 * jaccard >= 0.80)
      |        OR jaccard >= 0.60) AS is_match,
      |       CASE WHEN (jw >= 0.92 AND 0.6 * jw + 0.4 * jaccard >= 0.80)
      |                 OR jaccard >= 0.60
      |            THEN levenshtein(ns_a, ns_b) ELSE -1 END AS lev
      |FROM s""".stripMargin

  /** Pairwise-F1 replay over the dumped pair universe + cluster
    * assignment: gold/pred pair agreement, TP/FP/FN sums, P/R/F1 doubles
    * (identical IEEE expression tree to PairEval.pairwise). */
  val erPairwiseEvalSql: String =
    """WITH s AS (SELECT a, b, gold_a, gold_b FROM '{OUT}/er_scored_pairs/*.parquet'),
      |c AS (SELECT id, cluster FROM '{OUT}/er_clusters/*.parquet'),
      |j AS (SELECT (s.gold_a = s.gold_b) AS gp, (ca.cluster = cb.cluster) AS pp
      |      FROM s JOIN c ca ON s.a = ca.id JOIN c cb ON s.b = cb.id),
      |t AS (SELECT CAST(sum(CASE WHEN gp AND pp THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |             CAST(sum(CASE WHEN NOT gp AND pp THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |             CAST(sum(CASE WHEN gp AND NOT pp THEN 1 ELSE 0 END) AS BIGINT) AS fn
      |      FROM j),
      |pr AS (SELECT tp, fp, fn,
      |         CASE WHEN tp + fp = 0 THEN 0.0
      |              ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS p,
      |         CASE WHEN tp + fn = 0 THEN 0.0
      |              ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS r
      |       FROM t)
      |SELECT tp, fp, fn, p AS "precision", r AS recall,
      |       CASE WHEN p + r = 0 THEN 0.0 ELSE 2 * p * r / (p + r) END AS f1
      |FROM pr""".stripMargin

  val mmMediaStatsSql: String =
    """SELECT kind, count(*) AS n,
      |       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
      |       CAST(sum(payload_bytes) AS BIGINT) AS total_bytes,
      |       CAST(round(avg(mean_intensity) * 1e6) AS BIGINT) AS avg_intensity_ppm
      |FROM '{OUT}/aux_media_decoded/*.parquet' GROUP BY kind""".stripMargin

  val mmFrameSampleSql: String =
    """SELECT media_id, count(*) AS n_frames, max(frame_bytes) AS frame_bytes
      |FROM '{OUT}/aux_media_frames/*.parquet' GROUP BY media_id""".stripMargin

  /** Connected components as a DuckDB recursive CTE — min-label
    * propagation over the dumped match edges: a (node, candidate-min)
    * pair spreads to neighbors only while the candidate is smaller than
    * the receiver, so the fixpoint assigns every node its component
    * minimum, exactly the engine's large-star/small-star output. The
    * mention universe comes from the er_mentions dump (singletons keep
    * themselves). */
  val erClustersSql: String =
    """WITH RECURSIVE e AS (SELECT a, b FROM '{OUT}/er_scored_pairs/*.parquet' WHERE is_match),
      |und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
      |lab(n, m) AS (
      |  SELECT greatest(a, b) AS n, least(a, b) AS m FROM e
      |  UNION
      |  SELECT u.b AS n, l.m FROM lab l JOIN und u ON l.n = u.a WHERE l.m < u.b),
      |mn AS (SELECT n, min(m) AS m FROM lab GROUP BY n)
      |SELECT mm.mention_id AS id, CAST(coalesce(mn.m, mm.mention_id) AS BIGINT) AS cluster
      |FROM (SELECT mention_id FROM '{OUT}/er_mentions/*.parquet') mm
      |LEFT JOIN mn ON mm.mention_id = mn.n""".stripMargin

  /** Survivor decision replay: exact edges recomputed from the documents
    * table (DuckDB's md5 hashes the same UTF-8 bytes as the engine's
    * md5(cast binary)), near edges from the dumped minhash pair table
    * (identical parameters by construction), transitive closure via the
    * same min-label recursion, then the keep/exact/near tiering rules. */
  val ddSurvivorsSql: String =
    """WITH RECURSIVE d AS (SELECT doc_id AS id, md5(text) AS h FROM documents),
      |g AS (SELECT h, min(id) AS gmin, count(*) AS gsz FROM d GROUP BY h),
      |exact_e AS (SELECT d.id AS a, g.gmin AS b FROM d JOIN g ON d.h = g.h WHERE d.id <> g.gmin),
      |near_e AS (SELECT id_a AS a, id_b AS b FROM '{OUT}/dd_minhash_pairs/*.parquet'),
      |e AS (SELECT a, b FROM exact_e UNION SELECT a, b FROM near_e),
      |und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
      |lab(n, m) AS (
      |  SELECT greatest(a, b) AS n, least(a, b) AS m FROM e
      |  UNION
      |  SELECT u.b AS n, l.m FROM lab l JOIN und u ON l.n = u.a WHERE l.m < u.b),
      |mn AS (SELECT n, min(m) AS m FROM lab GROUP BY n)
      |SELECT d.id, CAST(coalesce(mn.m, d.id) AS BIGINT) AS survivor_id,
      |  CASE WHEN coalesce(mn.m, d.id) = d.id THEN 'keep'
      |       WHEN g.gsz > 1 THEN 'exact' ELSE 'near' END AS tier
      |FROM d JOIN g ON d.h = g.h LEFT JOIN mn ON d.id = mn.n""".stripMargin

  /** Fused survivor replay (dd_survivors_full): the batch-survivors SQL
    * extended with CONTAINMENT edges from the dd_containment_pairs dump
    * (independently gated — the ann_recall non-circularity pattern) and
    * the victim tier. Tier precedence mirrors Dedup.survivors exactly:
    * keep > exact > contained > near, with the family representative
    * still the component min id. */
  val ddSurvivorsFullSql: String =
    """WITH RECURSIVE d AS (SELECT doc_id AS id, md5(text) AS h FROM documents),
      |g AS (SELECT h, min(id) AS gmin, count(*) AS gsz FROM d GROUP BY h),
      |exact_e AS (SELECT d.id AS a, g.gmin AS b FROM d JOIN g ON d.h = g.h WHERE d.id <> g.gmin),
      |near_e AS (SELECT id_a AS a, id_b AS b FROM '{OUT}/dd_minhash_pairs/*.parquet'),
      |cont AS (SELECT doc_a, doc_b FROM '{OUT}/dd_containment_pairs/*.parquet'),
      |e AS (SELECT a, b FROM exact_e UNION SELECT a, b FROM near_e
      |      UNION SELECT doc_a AS a, doc_b AS b FROM cont),
      |und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
      |lab(n, m) AS (
      |  SELECT greatest(a, b) AS n, least(a, b) AS m FROM e
      |  UNION
      |  SELECT u.b AS n, l.m FROM lab l JOIN und u ON l.n = u.a WHERE l.m < u.b),
      |mn AS (SELECT n, min(m) AS m FROM lab GROUP BY n),
      |victims AS (SELECT DISTINCT doc_a AS id FROM cont)
      |SELECT d.id, CAST(coalesce(mn.m, d.id) AS BIGINT) AS survivor_id,
      |  CASE WHEN coalesce(mn.m, d.id) = d.id THEN 'keep'
      |       WHEN g.gsz > 1 THEN 'exact'
      |       WHEN v.id IS NOT NULL THEN 'contained'
      |       ELSE 'near' END AS tier
      |FROM d JOIN g ON d.h = g.h LEFT JOIN mn ON d.id = mn.n
      |LEFT JOIN victims v ON d.id = v.id""".stripMargin

  /** 64x64→64-bit wrapping multiply as 32-bit-limb HUGEINT arithmetic
    * (a full 64x64 product can reach 2^128 and overflows INT128). */
  private def mulMod64(z: String, c: Long): String = {
    val cl = c & 0xFFFFFFFFL
    val ch = (c >>> 32) & 0xFFFFFFFFL
    s"((($z) % 4294967296) * $cl + " +
      s"(((($z) % 4294967296) * $ch + (($z) // 4294967296) * $cl) % 4294967296) * 4294967296" +
      s") % 18446744073709551616"
  }

  /** The full splitmix64 pipeline as staged CTE columns (graft.synth
    * .Synth.splitmix64: add golden-gamma, two xorshift-multiplies, final
    * xorshift — each multiply via mulMod64). */
  private def splitmixStages(from: String): String =
    s"""s1 AS (SELECT b, d, k, (x + 11400714819323198485) % 18446744073709551616 AS z FROM $from),
       |s2 AS (SELECT b, d, k, ${mulMod64("xor(z, z // 1073741824)", 0xBF58476D1CE4E5B9L)} AS z FROM s1),
       |s3 AS (SELECT b, d, k, ${mulMod64("xor(z, z // 134217728)", 0x94D049BB133111EBL)} AS z FROM s2),
       |s4 AS (SELECT b, d, k, xor(z, z // 2147483648) AS z FROM s3)""".stripMargin

  /** Full random-hyperplane LSH dedup replay (Dedup.embeddingDupPairs,
    * nBits=16 bandBits=4 seed=42 minCosine=0.25): the pseudo-gaussian
    * plane matrix is regenerated IN SQL — splitmix64 as HUGEINT limb
    * arithmetic (validated bit-exact), uniforms as (z >>> 11)/2^53, the
    * 4-uniform sum left-associated like the Scala fold — signatures from
    * sequential-fold dot products (list_reduce keeps the engine's
    * index-order double accumulation), band buckets by bit arithmetic,
    * and the verified cosine via list_cosine_similarity (bit-identical to
    * the engine's fused CosineExpr on every pair). Assumes the synthetic
    * 64-dim embeddings and that no band bucket exceeds the 4096 cap at
    * oracle scale (500 vectors / 16 buckets — a violation would diverge
    * loudly as a row-count mismatch, never silently). */
  val ddEmbeddingDupsSql: String =
    s"""WITH cells AS (
       |  SELECT b.range AS b, d.range AS d, k.range AS k,
       |    CAST(xor(CAST(42 AS HUGEINT),
       |             CAST((b.range * 64 + d.range) * 4 + k.range AS HUGEINT)) AS HUGEINT) AS x
       |  FROM range(16) b, range(64) d, range(4) k),
       |${splitmixStages("cells")},
       |u AS (SELECT b, d, k, CAST(z // 2048 AS DOUBLE) / 9007199254740992.0 AS uval FROM s4),
       |pv AS (SELECT b, d,
       |         max(CASE WHEN k = 0 THEN uval END) + max(CASE WHEN k = 1 THEN uval END)
       |       + max(CASE WHEN k = 2 THEN uval END) + max(CASE WHEN k = 3 THEN uval END) - 2.0 AS val
       |       FROM u GROUP BY b, d),
       |planes AS (SELECT b, list(val ORDER BY d) AS pl FROM pv GROUP BY b),
       |vecs AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |dots AS (SELECT vecs.id, planes.b,
       |           list_reduce(list_transform(range(1, 65), i -> vecs.v[i] * planes.pl[i]),
       |                       (x, y) -> x + y) AS dot
       |         FROM vecs, planes),
       |sigs AS (SELECT id, CAST(sum(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sig
       |         FROM dots GROUP BY id),
       |banded AS (SELECT band.range AS band, (sig >> CAST(band.range * 4 AS INTEGER)) & 15 AS bucket, id
       |           FROM sigs, range(4) band),
       |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |         FROM banded l JOIN banded r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
       |vpair AS (SELECT id_a, id_b, list_cosine_similarity(a.v, b.v) AS cosine
       |          FROM cand JOIN vecs a ON cand.id_a = a.id JOIN vecs b ON cand.id_b = b.id)
       |SELECT id_a, id_b, cosine FROM vpair WHERE cosine >= 0.25""".stripMargin

  /** One Lloyd iteration as CTE stages: assign each sample vector to its
    * nearest centroid ((cosine DESC, index ASC) — the engine's
    * first-max-wins scan), then recompute each centroid as the per-dim
    * mean folded IN SAMPLE ORDER (list(v ORDER BY pos) + list_reduce: the
    * engine accumulates sums in hash-sample order, and double addition is
    * order-sensitive); empty cells keep their old centroid. Trains over
    * `train` (the engine's capped hash-ordered sample), never the whole
    * corpus. */
  private def lloydIter(prev: String, cur: String): String =
    s"""a_$cur AS (
       |  SELECT s.id, s.pos, s.v, ce.c,
       |         row_number() OVER (PARTITION BY s.id
       |           ORDER BY list_cosine_similarity(ce.v, s.v) DESC, ce.c ASC) AS rn
       |  FROM train s, $prev ce),
       |mem_$cur AS (
       |  SELECT c, list(v ORDER BY pos) AS vs, count(*) AS cnt
       |  FROM a_$cur WHERE rn = 1 GROUP BY c),
       |$cur AS (
       |  SELECT pc.c,
       |    CASE WHEN m.cnt IS NULL THEN pc.v
       |         ELSE list_transform(range(1, 65), d ->
       |                list_reduce(list_transform(m.vs, mv -> mv[d]), (x, y) -> x + y) / m.cnt)
       |    END AS v
       |  FROM $prev pc LEFT JOIN mem_$cur m ON pc.c = m.c)""".stripMargin

  /** Full IVF ANN replay (Ann.ivfTopK auto-sized, nProbe=4, k=5): the
    * deterministic hash-ordered training sample (splitmix64 as staged
    * limb arithmetic, SIGNED-long sort order restored), SCALE-ADAPTIVE
    * like the engine — nLists = clamp(round(sqrt(n)), 4, 65536) and the
    * training sample capped at max(4096, nLists) smallest-hash rows (at
    * sf0.01 that is the whole corpus; at sf0.1+ the cap is live, which a
    * corpus-pinned replay used to fail) — then THREE Lloyd iterations
    * with order-exact double folds over the sample, whole-corpus cell
    * assignment, per-query nProbe probing, and exact cosine re-rank.
    * Only the 64-dim width stays pinned (the testdata embedding shape). */
  /** IVF replay parameterized by the TRAINING predicate: autoNLists,
    * the splitmix sample order, and the Lloyd rounds run over the rows
    * matching `trainPred`, while assignment and the query set always
    * cover the FULL corpus — `TRUE` reproduces the one-shot ann_ivf_topk
    * exactly; the standing-only predicate replays ann_ivf_incr's frozen
    * centroids (engine: Ann.buildIvfIndex on standing + ivfAppend of the
    * batch — incremental == this replay bit-for-bit). */
  private def ivfTopkSqlWith(trainPred: String): String =
    s"""WITH h0 AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
       |            CAST(vec_id AS HUGEINT) AS x FROM embeddings WHERE $trainPred),
       |allv AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |h1 AS (SELECT id, v, (x + 11400714819323198485) % 18446744073709551616 AS z FROM h0),
       |h2 AS (SELECT id, v, ${mulMod64("xor(z, z // 1073741824)", 0xBF58476D1CE4E5B9L)} AS z FROM h1),
       |h3 AS (SELECT id, v, ${mulMod64("xor(z, z // 134217728)", 0x94D049BB133111EBL)} AS z FROM h2),
       |h4 AS (SELECT id, v, xor(z, z // 2147483648) AS z FROM h3),
       |samp AS (SELECT id, v,
       |           row_number() OVER (ORDER BY
       |             CAST(CASE WHEN z >= 9223372036854775808
       |                       THEN z - 18446744073709551616 ELSE z END AS BIGINT) ASC, id ASC) AS pos
       |         FROM h4),
       |nl AS (SELECT greatest(4, least(65536,
       |         CAST(round(sqrt(count(*))) AS INTEGER))) AS lists
       |       FROM embeddings WHERE $trainPred),
       |train AS (SELECT s.* FROM samp s, nl
       |          WHERE s.pos <= greatest(4096, nl.lists)),
       |cent0 AS (SELECT s.pos - 1 AS c, s.v FROM train s, nl WHERE s.pos <= nl.lists),
       |${lloydIter("cent0", "cent1")},
       |${lloydIter("cent1", "cent2")},
       |${lloydIter("cent2", "cent3")},
       |assignf AS (
       |  SELECT s.id AS nbr_id, s.v AS cv, ce.c AS cell,
       |         row_number() OVER (PARTITION BY s.id
       |           ORDER BY list_cosine_similarity(ce.v, s.v) DESC, ce.c ASC) AS rn
       |  FROM allv s, cent3 ce),
       |corpus_cells AS (SELECT cell, nbr_id, cv FROM assignf WHERE rn = 1),
       |qprobe AS (
       |  SELECT q.id AS query_id, q.v AS qv, ce.c AS cell,
       |         row_number() OVER (PARTITION BY q.id
       |           ORDER BY list_cosine_similarity(ce.v, q.v) DESC, ce.c ASC) AS prn
       |  FROM (SELECT id, v FROM allv WHERE id < ${TrainingDataQueries.AnnQueryMax}) q, cent3 ce),
       |probes AS (SELECT query_id, qv, cell FROM qprobe WHERE prn <= ${TrainingDataQueries.AnnNProbe}),
       |cand AS (
       |  SELECT p.query_id, c.nbr_id,
       |         row_number() OVER (PARTITION BY p.query_id
       |           ORDER BY list_cosine_similarity(p.qv, c.cv) DESC, c.nbr_id ASC) AS rank
       |  FROM probes p JOIN corpus_cells c ON p.cell = c.cell
       |  WHERE c.nbr_id <> p.query_id)
       |SELECT query_id, rank, nbr_id FROM cand WHERE rank <= ${TrainingDataQueries.AnnK}""".stripMargin

  val annIvfTopkSql: String = ivfTopkSqlWith("TRUE")

  /** ann_ivf_incr: frozen centroids trained on the standing slice,
    * assignment over the union — the incremental-IVF equality gate. */
  val annIvfIncrSql: String =
    ivfTopkSqlWith(s"vec_id % ${TrainingDataQueries.AnnIncrMod} <> 0")

  /** LSH ANN replay: identical plane/signature machinery to
    * ddEmbeddingDupsSql (same seed-42 hyperplanes), query side restricted
    * to vec_id < 20, candidates = band-bucket co-members, exact cosine
    * re-rank top-5 under the engine's (cosine DESC, nbr ASC) order. */
  val annLshTopkSql: String =
    s"""WITH cells AS (
       |  SELECT b.range AS b, d.range AS d, k.range AS k,
       |    CAST(xor(CAST(42 AS HUGEINT),
       |             CAST((b.range * 64 + d.range) * 4 + k.range AS HUGEINT)) AS HUGEINT) AS x
       |  FROM range(16) b, range(64) d, range(4) k),
       |${splitmixStages("cells")},
       |u AS (SELECT b, d, k, CAST(z // 2048 AS DOUBLE) / 9007199254740992.0 AS uval FROM s4),
       |pv AS (SELECT b, d,
       |         max(CASE WHEN k = 0 THEN uval END) + max(CASE WHEN k = 1 THEN uval END)
       |       + max(CASE WHEN k = 2 THEN uval END) + max(CASE WHEN k = 3 THEN uval END) - 2.0 AS val
       |       FROM u GROUP BY b, d),
       |planes AS (SELECT b, list(val ORDER BY d) AS pl FROM pv GROUP BY b),
       |vecs AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |dots AS (SELECT vecs.id, planes.b,
       |           list_reduce(list_transform(range(1, 65), i -> vecs.v[i] * planes.pl[i]),
       |                       (x, y) -> x + y) AS dot
       |         FROM vecs, planes),
       |sigs AS (SELECT id, CAST(sum(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sig
       |         FROM dots GROUP BY id),
       |banded AS (SELECT band.range AS band, (sig >> CAST(band.range * 4 AS INTEGER)) & 15 AS bucket, id
       |           FROM sigs, range(4) band),
       |cand AS (SELECT DISTINCT q.id AS query_id, c.id AS nbr_id
       |         FROM banded q JOIN banded c ON q.band = c.band AND q.bucket = c.bucket AND q.id <> c.id
       |         WHERE q.id < ${TrainingDataQueries.AnnQueryMax}),
       |ranked AS (SELECT query_id, nbr_id,
       |             row_number() OVER (PARTITION BY query_id
       |               ORDER BY list_cosine_similarity(a.v, b.v) DESC, nbr_id ASC) AS rank
       |           FROM cand JOIN vecs a ON cand.query_id = a.id JOIN vecs b ON cand.nbr_id = b.id)
       |SELECT query_id, rank, nbr_id FROM ranked WHERE rank <= ${TrainingDataQueries.AnnK}""".stripMargin

  /** Unsigned decimal rendering of a Scala hex literal — every 64-bit
    * constant in these oracles is DERIVED from the same hex the engine
    * uses (a hand-transcribed decimal seed cost a debugging detour). */
  private def u64(x: Long): String = java.lang.Long.toUnsignedString(x)

  /** FNV offset basis used by Dedup.hashString / charShingles. */
  private val Fnv = u64(0x6C62272E07BB0142L)
  private val Gamma = 0x9E3779B97F4A7C15L

  /** splitmix64 fully inlined into one expression (for lambda folds). */
  private def splitmixInline(e: String): String = {
    val z0 = s"((($e) + ${u64(Gamma)}) % 18446744073709551616)"
    val z1 = s"(${mulMod64(s"xor($z0, ($z0) // 1073741824)", 0xBF58476D1CE4E5B9L)})"
    val z2 = s"(${mulMod64(s"xor($z1, ($z1) // 134217728)", 0x94D049BB133111EBL)})"
    s"xor($z2, ($z2) // 2147483648)"
  }

  /** Char-fold stage i of the 5-char shingle hash (staged CTE columns). */
  private def shingleFoldStage(i: Int): String = {
    val keep = (Seq("doc_id", "p") ++ (i + 1 to 5).map("c" + _)).mkString(", ")
    s"""g${i}a AS (SELECT $keep, ((xor(z, c$i)) + ${u64(Gamma)}) % 18446744073709551616 AS z FROM g${i - 1}),
       |g${i}b AS (SELECT $keep, ${mulMod64("xor(z, z // 1073741824)", 0xBF58476D1CE4E5B9L)} AS z FROM g${i}a),
       |g${i}c AS (SELECT $keep, ${mulMod64("xor(z, z // 134217728)", 0x94D049BB133111EBL)} AS z FROM g${i}b),
       |g$i AS (SELECT $keep, xor(z, z // 2147483648) AS z FROM g${i}c)""".stripMargin
  }

  /** Full MinHash-LSH replay (Dedup.minhashPairs, shingleK=5 nHashes=64
    * rowsPerBand=8 minJaccard=0.35): char 5-gram hashes via five staged
    * splitmix64 folds, hash-level dedup (the engine's Set[Long]), the 64
    * minhash functions via the per-k xor constants, SIGNED minimum (the
    * engine compares Longs), and band-SLICE-EQUALITY joins in place of
    * the engine's xxhash64 bucket keys (equal slices ⟺ equal buckets;
    * an xxhash collision would surface as an extra engine pair — a loud
    * row mismatch). est_jaccard = agreement/64, both engines exact. */
  val ddMinhashPairsSql: String = {
    val mask = (BigInt(1) << 64) - 1
    val kconsts = (0 until 64)
      .map(k => s"CAST(${(BigInt(Gamma) * (k + 3)) & mask} AS HUGEINT)")
      .mkString("[", ",", "]")
    s"""WITH pos AS (
       |  SELECT doc_id, text, unnest(range(1, greatest(length(text) - 4, 0) + 1)) AS p
       |  FROM documents WHERE length(text) >= 5),
       |shing0 AS (
       |  SELECT doc_id, p,
       |    CAST(unicode(substr(text, CAST(p AS INTEGER), 1)) AS HUGEINT) AS c1,
       |    CAST(unicode(substr(text, CAST(p + 1 AS INTEGER), 1)) AS HUGEINT) AS c2,
       |    CAST(unicode(substr(text, CAST(p + 2 AS INTEGER), 1)) AS HUGEINT) AS c3,
       |    CAST(unicode(substr(text, CAST(p + 3 AS INTEGER), 1)) AS HUGEINT) AS c4,
       |    CAST(unicode(substr(text, CAST(p + 4 AS INTEGER), 1)) AS HUGEINT) AS c5
       |  FROM pos),
       |g0 AS (SELECT doc_id, p, c1, c2, c3, c4, c5, CAST($Fnv AS HUGEINT) AS z FROM shing0),
       |${shingleFoldStage(1)},
       |${shingleFoldStage(2)},
       |${shingleFoldStage(3)},
       |${shingleFoldStage(4)},
       |${shingleFoldStage(5)},
       |shashes AS (SELECT DISTINCT doc_id, z AS sh FROM g5),
       |ks AS (SELECT k.range AS k, ($kconsts)[CAST(k.range + 1 AS INTEGER)] AS kc FROM range(64) k),
       |m0 AS (SELECT doc_id, k, xor(sh, kc) AS x FROM shashes, ks),
       |m1 AS (SELECT doc_id, k, (x + ${u64(Gamma)}) % 18446744073709551616 AS z FROM m0),
       |m2 AS (SELECT doc_id, k, ${mulMod64("xor(z, z // 1073741824)", 0xBF58476D1CE4E5B9L)} AS z FROM m1),
       |m3 AS (SELECT doc_id, k, ${mulMod64("xor(z, z // 134217728)", 0x94D049BB133111EBL)} AS z FROM m2),
       |m4 AS (SELECT doc_id, k, xor(z, z // 2147483648) AS z FROM m3),
       |mh AS (SELECT doc_id, k,
       |         min(CAST(CASE WHEN z >= 9223372036854775808
       |                       THEN z - 18446744073709551616 ELSE z END AS BIGINT)) AS mv
       |       FROM m4 GROUP BY doc_id, k),
       |sigs AS (SELECT doc_id, list(mv ORDER BY k) AS sig FROM mh GROUP BY doc_id),
       |banded AS (SELECT b.range AS band, doc_id, sig,
       |             sig[CAST(b.range * 8 + 1 AS INTEGER):CAST(b.range * 8 + 8 AS INTEGER)] AS bs
       |           FROM sigs, range(8) b),
       |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, l.sig AS sa, r.sig AS sb
       |          FROM banded l JOIN banded r ON l.band = r.band AND l.bs = r.bs AND l.doc_id < r.doc_id),
       |est AS (SELECT id_a, id_b,
       |          CAST(length(list_filter(range(1, 65), i -> sa[i] = sb[i])) AS DOUBLE) / 64 AS est_jaccard
       |        FROM pairs)
       |SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.35""".stripMargin
  }

  /** Full SimHash replay (Dedup.simhashPairs, maxHamming=8 → 9 bands of
    * width 7): per-token rolling hashes via splitmix64 INLINED into a
    * list_reduce fold (UTF-16 units, Java-split semantics via rtrim),
    * per-bit majority vote, UNSIGNED band extraction on the 64-bit
    * signature (bits band*7 .. band*7+6 via nonneg HUGEINT division —
    * matching the engine's shiftrightunsigned+mask; signed div/% would
    * make buckets sign- and borrow-dependent), pigeonhole pairs with
    * bit_count(xor) <= 8. */
  val ddSimhashPairsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, CASE WHEN rtrim(text, ' ') = '' THEN CAST([] AS VARCHAR[])
       |                      ELSE string_split(rtrim(text, ' '), ' ') END AS ts
       |  FROM documents),
       |hashes AS (
       |  SELECT doc_id, list_transform(ts, t ->
       |    list_reduce(list_prepend(CAST($Fnv AS HUGEINT),
       |      flatten(list_transform(range(1, length(t) + 1), i ->
       |        CASE WHEN unicode(substr(t, i, 1)) < 65536
       |             THEN [CAST(unicode(substr(t, i, 1)) AS HUGEINT)]
       |             ELSE [CAST(55296 + ((unicode(substr(t, i, 1)) - 65536) // 1024) AS HUGEINT),
       |                   CAST(56320 + ((unicode(substr(t, i, 1)) - 65536) % 1024) AS HUGEINT)]
       |        END))),
       |      (a, c) -> ${splitmixInline("xor(a, c)")})) AS hs
       |  FROM toks),
       |sims AS (
       |  SELECT doc_id,
       |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(0, 64), b ->
       |        CASE WHEN 2 * length(list_filter(hs, h -> (h >> CAST(b AS INTEGER)) % 2 = 1)) > length(hs)
       |             THEN (CAST(1 AS HUGEINT) << CAST(b AS INTEGER)) ELSE CAST(0 AS HUGEINT) END)),
       |      (x, y) -> x + y) AS HUGEINT) AS usim
       |  FROM hashes),
       |sig AS (SELECT doc_id AS id, usim,
       |          CAST(CASE WHEN usim >= 9223372036854775808
       |                    THEN usim - 18446744073709551616 ELSE usim END AS BIGINT) AS sim
       |        FROM sims),
       |banded AS (SELECT band.range AS band,
       |             (usim // (CAST(1 AS HUGEINT) << CAST(band.range * 7 AS INTEGER))) % 128 AS bucket,
       |             id, sim
       |           FROM sig, range(9) band),
       |pairs AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.sim AS sa, r.sim AS sb
       |          FROM banded l JOIN banded r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id)
       |SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
       |FROM pairs WHERE bit_count(xor(sa, sb)) <= 8""".stripMargin

  /** er_extract re-derivation: per-url counts re-aggregated from the
    * SPAN-granularity extraction dumps (text / links / synonyms /
    * sections). The extraction pass itself is golden-tested byte-identical
    * against the reference; this oracle gates the downstream count/join
    * logic without re-selecting the query's own output. */
  val erExtractSql: String =
    """WITH docs AS (SELECT url, text FROM '{OUT}/aux_extract_text/*.parquet'),
      |hl  AS (SELECT url, count(*) AS n FROM '{OUT}/aux_extract_links/*.parquet' GROUP BY url),
      |syn AS (SELECT url, count(*) AS n FROM '{OUT}/aux_extract_synonyms/*.parquet' GROUP BY url),
      |sec AS (SELECT url, count(*) AS n FROM '{OUT}/aux_extract_sections/*.parquet' GROUP BY url)
      |SELECT d.url, CAST(length(d.text) AS BIGINT) AS text_len,
      |       CAST(coalesce(hl.n, 0) AS BIGINT) AS n_hyperlinks,
      |       CAST(coalesce(syn.n, 0) AS BIGINT) AS n_title_synonyms,
      |       CAST(coalesce(sec.n, 0) AS BIGINT) AS n_sections
      |FROM docs d LEFT JOIN hl ON d.url = hl.url
      |LEFT JOIN syn ON d.url = syn.url LEFT JOIN sec ON d.url = sec.url
      |WHERE CASE WHEN (SELECT count(*) FROM docs WHERE strlen(text) <> length(text)) > 0
      |           THEN error('aux_extract_text contains non-ASCII: this oracle equates DuckDB codepoint length() with Java UTF-16 length — replay offsets in UTF-16 units (as the mention_id fold does for urls) before trusting it')
      |           ELSE TRUE END""".stripMargin

  /** er_mentions re-derivation from the extraction dumps: surface =
    * substring of the page text at the hyperlink span (ASCII corpus, so
    * DuckDB codepoint substr == Java UTF-16 substring); norm_surface =
    * the lowercase/alnum-run normalization as a regex; mention_id =
    * Mentions.mentionId's splitmix64 chain over (begin, url UTF-16 units)
    * replayed as a HUGEINT list_reduce fold — the same surrogate-safe
    * unit expansion the SimHash replay uses. */
  val erMentionsSql: String =
    s"""WITH m AS (
       |  SELECT l.url, l."begin", l."end",
       |         substr(d.text, l."begin" + 1, l."end" - l."begin") AS surface,
       |         l.target AS gold_entity
       |  FROM '{OUT}/aux_extract_links/*.parquet' l
       |  JOIN '{OUT}/aux_extract_text/*.parquet' d ON l.url = d.url),
       |ids AS (
       |  SELECT url, "begin", "end", surface, gold_entity,
       |    list_reduce(
       |      list_prepend(${splitmixInline(s"""(CAST("begin" AS HUGEINT) + ${0x9E37L})""")},
       |        flatten(list_transform(range(1, length(url) + 1), i ->
       |          CASE WHEN unicode(substr(url, i, 1)) < 65536
       |               THEN [CAST(unicode(substr(url, i, 1)) AS HUGEINT)]
       |               ELSE [CAST(55296 + ((unicode(substr(url, i, 1)) - 65536) // 1024) AS HUGEINT),
       |                     CAST(56320 + ((unicode(substr(url, i, 1)) - 65536) % 1024) AS HUGEINT)]
       |          END))),
       |      (a, c) -> ${splitmixInline("xor(a, c)")}) AS uid
       |  FROM m)
       |SELECT url,
       |       CAST(CASE WHEN uid >= 9223372036854775808
       |                 THEN uid - 18446744073709551616 ELSE uid END AS BIGINT) AS mention_id,
       |       "begin", "end", surface,
       |       trim(regexp_replace(lower(surface), '[^a-z0-9]+', ' ', 'g')) AS norm_surface,
       |       gold_entity
       |FROM ids
       |WHERE CASE WHEN (SELECT count(*) FROM '{OUT}/aux_extract_text/*.parquet'
       |                 WHERE strlen(text) <> length(text)) > 0
       |           THEN error('aux_extract_text contains non-ASCII: substr() offsets here are codepoint-based and would silently diverge from the Java UTF-16 spans — expand to UTF-16 units as the mention_id fold does for urls')
       |           ELSE TRUE END""".stripMargin

  /** eval_cases hybrid oracle — placeholder, replaced below. */
  val evalCasesSql: String = EvalCasesOracle.sql

  /** Exact brute-force ANN replay: cross join + window in DuckDB, ranked
    * by list_cosine_similarity under the same (cosine DESC, nbr ASC) total
    * order the engine uses. */
  val annBruteTopkSql: String =
    s"""WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |           WHERE vec_id < ${TrainingDataQueries.AnnQueryMax}),
      |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |SELECT query_id, rank, nbr_id FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
      |         row_number() OVER (PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC) AS rank
      |  FROM q, c WHERE c.vec_id <> q.vec_id)
      |WHERE rank <= ${TrainingDataQueries.AnnK}""".stripMargin

  /** The distinct (doc_id, gram) relation both n-gram-overlap oracles
    * consume: token n-grams re-derived with the repetitionCtes pattern
    * (range is empty when the doc is shorter than n — DuckDB's range
    * never descends, matching the engine's guarded sequence). Gram size
    * and the eval-slice predicate interpolate from the SAME
    * TrainingDataQueries constants as the engine calls (the AnnK rule). */
  private def docGramsCte: String = {
    val n = TrainingDataQueries.DecontamN
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT DISTINCT doc_id, ng AS gram
       |      FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${n - 2}), i ->
       |              array_to_string(toks[i:i + ${n - 1}], ' '))) AS ng FROM d))""".stripMargin
  }

  private def isEvalPred: String =
    s"doc_id % ${TrainingDataQueries.DecontamEvalMod} = ${TrainingDataQueries.DecontamEvalRes}"

  /** Benchmark-decontamination replay (dc_decontam): distinct training
    * grams joined against the distinct eval gram set, counted per doc. */
  val dcDecontamSql: String =
    s"""WITH $docGramsCte,
      |ev AS (SELECT DISTINCT gram FROM g WHERE $isEvalPred),
      |h AS (SELECT doc_id, count(*) AS nh
      |      FROM g JOIN ev USING (gram) WHERE NOT ($isEvalPred) GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(h.nh, 0) AS BIGINT) AS n_hit_grams,
      |       coalesce(h.nh, 0) > 0 AS contaminated
      |FROM d LEFT JOIN h USING (doc_id) WHERE NOT ($isEvalPred)""".stripMargin

  /** Span-level decontamination replay (dc_decontam_spans): hit
    * positions from the same gram relation (0-based), islands merged
    * with the identical overlap-or-touch rule (break when
    * pos > lag + n; the first row's NULL lag falls to the ELSE branch in
    * both engines). */
  val dcDecontamSpansSql: String = {
    val n = TrainingDataQueries.DecontamN
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (SELECT doc_id, pos, gram FROM (
      |        SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${n - 2}), i ->
      |                 i - 1)) AS pos,
      |               unnest(list_transform(range(1, len(toks) - ${n - 2}), i ->
      |                 array_to_string(toks[i:i + ${n - 1}], ' '))) AS gram FROM d)),
      |ev AS (SELECT DISTINCT gram FROM g WHERE $isEvalPred),
      |h AS (SELECT doc_id, pos FROM g JOIN ev USING (gram) WHERE NOT ($isEvalPred)),
      |m AS (SELECT doc_id, pos,
      |        CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $n
      |             THEN 1 ELSE 0 END AS brk FROM h),
      |gr AS (SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |           ROWS UNBOUNDED PRECEDING) AS grp FROM m)
      |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
      |       CAST(max(pos) + ${n - 1} AS BIGINT) AS span_end
      |FROM gr GROUP BY doc_id, grp""".stripMargin
  }

  /** Inter-document n-gram duplication replay (dc_dup_ngrams): gram
    * frequency = distinct-doc count, a doc's gram is dup when that count
    * exceeds 1. */
  val dcDupNgramsSql: String =
    s"""WITH $docGramsCte,
      |f AS (SELECT gram, count(*) AS gf FROM g GROUP BY gram),
      |p AS (SELECT doc_id, count(*) AS ng,
      |             sum(CASE WHEN gf > 1 THEN 1 ELSE 0 END) AS nd
      |      FROM g JOIN f USING (gram) GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(p.ng, 0) AS BIGINT) AS n_grams,
      |       CAST(coalesce(p.nd, 0) AS BIGINT) AS n_dup_grams
      |FROM d LEFT JOIN p USING (doc_id)""".stripMargin
}
