package graft.queries

/** Hybrid DuckDB oracle for the eval_cases query (round-4 verdict item 3 —
  * the last rows-only driver query).
  *
  * Decomposition: the two recursion-bound pieces of case generation ride
  * golden-tested engine dumps, everything else is re-derived in SQL from
  * independently hash-gated upstream dumps:
  *
  *   - word-boundary span expansion (Extract.wordBoundary, doctest-golden
  *     against the reference) → `aux_label_spans` dump;
  *   - the factor recursion (case_generator.py:212-343) collapses to the
  *     constant 1 on the flat synthetic label forest (every label is a
  *     childless root: a correct prediction returns 1, and an incorrect /
  *     missing one hits the root base case `biggestChildFactor == 0 → 1`),
  *     so the oracle pins `1` and the engine's factor column must agree;
  *   - labels come from the er_mentions dump (hash-gated), the baseline
  *     linker's predictions are replayed from the kb_top_candidates dump
  *     (hash-gated) exactly as BaselineLinker.linkMostPopular computes
  *     them (is_date filter, norm-surface equi-join, min tie-break,
  *     baseline_linker.py:43-74), and the allPredictions dict —
  *     raw span keys then word-boundary-expanded keys, later insertion
  *     winning (case_generator.py:93-101 `(raw ++ expanded).toMap`) — is
  *     replayed with a priority window;
  *   - the linking/NER decision tables (case.py:121-311), mention typing
  *     (mention_type.py:66-80, pronoun_finder.py:7-37), the canonical
  *     entity names (Synth name pools), and the reachable error-labeler
  *     branches (errors.py:14-379 with empty demonym/most-popular
  *     metadata) are full SQL.
  *
  * Branches that cannot occur by construction are GUARDED with loud
  * `error()` calls instead of silently diverging: non-`E<n>` gold or
  * predicted ids (would break the known-entity collapse of the decision
  * tables) and potential-false-detection predictions outside the ground-
  * truth span universe (the oracle derives GT cases only).
  */
object EvalCasesOracle {

  // the engine's own pattern, interpolated — a date-filter retune cannot
  // silently desynchronize the oracle (same rule as taGopherFilterSql)
  private val DateRe = graft.text.Extract.DateRePattern

  private val Pronouns =
    "'i','my','me','myself','mine','you','your','yourself','yours','he','his','him','himself'," +
      "'she','her','herself','hers','it','its','itself','we','us','our','ourselves','ours'," +
      "'yourselves','they','their','them','themselves','theirs'"

  private val CorefPrefixes =
    "'the ','that ','this ','these ','those ','my ','your ','his ','her ','its ','our ','their '"

  // Synth name pools (synth/Synth.scala:49-65) as DuckDB list literals
  private val FirstA = "'Ban','Cel','Dor','Fen','Gim','Hul','Jor','Kav','Lim','Mon','Nar','Pol'"
  private val FirstB = "'ad','eb','ik','or','us'"
  private val LastA = "'kar','lin','mor','ost','pel','qua','rud','sal','tav','urn','vel','wim','zet'"
  private val LastB = "'berg','feld','stein','holm','wick','thorp','gaard','strom'"

  val sql: String =
    s"""WITH m0 AS (
       |  SELECT url, "begin", "end", surface, norm_surface, gold_entity
       |  FROM '{OUT}/er_mentions/*.parquet'),
       |sp AS (
       |  SELECT url, "begin", "end", exp_begin, exp_end
       |  FROM '{OUT}/aux_label_spans/*.parquet'),
       |kb AS (
       |  SELECT link_text, string_split(candidates, ',') AS cands
       |  FROM '{OUT}/kb_top_candidates/*.parquet'),
       |-- BaselineLinker.linkMostPopular replay: drop date mentions, join the
       |-- most-popular-candidates dim on the normalized surface, predict the
       |-- minimum of the tied top candidates (baseline_linker.py:43-74)
       |preds AS (
       |  SELECT m.url, m."begin", m."end", list_min(kb.cands) AS pred_id, kb.cands
       |  FROM m0 m JOIN kb ON m.norm_surface = kb.link_text
       |  WHERE NOT regexp_full_match(m.surface, '$DateRe')),
       |-- allPredictions dict replay: raw keys inserted first, expanded keys
       |-- second; Scala (raw ++ expanded).toMap keeps the LAST insertion, so
       |-- per key the winner is max (priority, begin, end)
       |pred_entries AS (
       |  SELECT url, "begin" AS kb2, "end" AS ke, "begin", "end", pred_id, cands, 0 AS pri
       |  FROM preds
       |  UNION ALL
       |  SELECT p.url, s.exp_begin, s.exp_end, p."begin", p."end", p.pred_id, p.cands, 1 AS pri
       |  FROM preds p JOIN sp s
       |    ON p.url = s.url AND p."begin" = s."begin" AND p."end" = s."end"),
       |all_preds AS (
       |  SELECT url, kb2, ke, pred_id, cands FROM (
       |    SELECT *, row_number() OVER (PARTITION BY url, kb2, ke
       |      ORDER BY pri DESC, "begin" DESC, "end" DESC) AS rn
       |    FROM pred_entries) WHERE rn = 1),
       |labels AS (
       |  SELECT m.url, m."begin", m."end", m.surface, m.gold_entity,
       |         s.exp_begin, s.exp_end
       |  FROM m0 m JOIN sp s
       |    ON m.url = s.url AND m."begin" = s."begin" AND m."end" = s."end"),
       |-- span-join half of case generation: raw-span lookup with
       |-- expanded-span fallback (case_generator.py:93-101)
       |cases0 AS (
       |  SELECT l.*, coalesce(pr.pred_id, pe.pred_id) AS pred_id,
       |         coalesce(coalesce(pr.cands, pe.cands), []) AS cands
       |  FROM labels l
       |  LEFT JOIN all_preds pr
       |    ON l.url = pr.url AND l."begin" = pr.kb2 AND l."end" = pr.ke
       |  LEFT JOIN all_preds pe
       |    ON l.url = pe.url AND l.exp_begin = pe.kb2 AND l.exp_end = pe.ke),
       |-- canonical entity name (Synth.canonicalName port: index the fixed
       |-- name pools by the entity number)
       |named AS (
       |  SELECT *, CAST(substr(gold_entity, 2) AS INTEGER) AS en FROM cases0),
       |named2 AS (
       |  SELECT *,
       |    list_extract([$FirstA], 1 + (en % 60) % 12) ||
       |      list_extract([$FirstB], 1 + ((en % 60) // 12) % 5) AS fname,
       |    list_extract([$LastA], 1 + (en // 60) % 13) ||
       |      list_extract([$LastB], 1 + ((en // 60) // 13) % 8) AS lraw
       |  FROM named),
       |withname AS (
       |  SELECT *, fname || ' ' || upper(substr(lraw, 1, 1)) || substr(lraw, 2) AS gt_name
       |  FROM named2),
       |-- per-case predicates feeding the decision tables and error labeler
       |feats AS (
       |  SELECT *,
       |    pred_id IS NOT NULL AS has_pred,
       |    coalesce(pred_id = gold_entity, FALSE) AS eq,
       |    list_contains(cands, gold_entity) AS true_cand,
       |    -- isNonNamed: first alphabetic char of the SURFACE is lowercase
       |    -- or absent (mention_type.py entityMentionType on the text)
       |    (regexp_extract(surface, '[A-Za-z]') = '' OR
       |     NOT regexp_matches(regexp_extract(surface, '[A-Za-z]'), '[A-Z]')) AS non_named,
       |    -- isPartialName (errors.py): gt name has a space (always, for
       |    -- canonical First Last names), text strictly shorter, contained
       |    (strpos(gt_name, ' ') > 0 AND length(surface) < length(gt_name)
       |     AND strpos(gt_name, surface) > 0) AS partial_name,
       |    -- isPronoun with the all-caps exception (pronoun_finder.py)
       |    (list_contains([$Pronouns], lower(surface)) AND
       |     (lower(surface) = 'i' OR NOT (NOT regexp_matches(surface, '[a-z]')
       |                                   AND regexp_matches(surface, '[A-Za-z]')))) AS is_pron,
       |    -- isNominal: lowercase coref prefix followed by a non-uppercase char
       |    (len(list_filter([$CorefPrefixes], p ->
       |       starts_with(lower(surface), p) AND length(surface) > length(p)
       |       AND NOT regexp_matches(substr(surface, length(p) + 1, 1), '[A-Z]'))) > 0) AS is_nom
       |  FROM withname),
       |-- reachable decision-table collapse (case.py:121-311) for flat,
       |-- non-optional, known-gt, known-pred cases:
       |--   linking: no pred -> FN (both modes); equal -> TP; else FN,FP
       |--   ner:     no pred -> FN; else TP
       |derived AS (
       |  SELECT url, "begin", "end", surface, gt_name, has_pred, eq, true_cand,
       |    non_named, partial_name, cands,
       |    CASE WHEN is_pron THEN 'COREF_PRONOMINAL'
       |         WHEN is_nom THEN 'COREF_NOMINAL'
       |         WHEN regexp_extract(gt_name, '[A-Za-z]') <> '' AND
       |              regexp_matches(regexp_extract(gt_name, '[A-Za-z]'), '[A-Z]')
       |           THEN 'ENTITY_NAMED'
       |         ELSE 'ENTITY_NON_NAMED' END AS mention_type,
       |    CASE WHEN NOT has_pred THEN 'FN' WHEN eq THEN 'TP' ELSE 'FN,FP' END AS linking,
       |    CASE WHEN NOT has_pred THEN 'FN' ELSE 'TP' END AS ner
       |  FROM feats),
       |-- reachable error-labeler branches (errors.py via eval/ErrorLabeler
       |-- with EMPTY demonym/most-popular/type metadata; no NER-FP cases
       |-- exist, so the FN sublabels never see overlap spans, and every case
       |-- span is a document hyperlink span by benchmark construction)
       |errs AS (
       |  SELECT *, array_to_string(list_sort(list_filter([
       |    CASE WHEN NOT has_pred THEN 'NER_FN' END,
       |    CASE WHEN NOT has_pred AND non_named THEN 'NER_FN_LOWERCASED' END,
       |    CASE WHEN NOT has_pred AND NOT non_named THEN 'NER_FN_OTHER' END,
       |    CASE WHEN has_pred AND NOT eq THEN 'DISAMBIGUATION_WRONG' END,
       |    CASE WHEN has_pred AND NOT eq AND partial_name THEN 'DISAMBIGUATION_PARTIAL_NAME_WRONG' END,
       |    CASE WHEN has_pred AND NOT eq AND NOT partial_name THEN 'DISAMBIGUATION_OTHER_WRONG' END,
       |    CASE WHEN has_pred AND (eq OR true_cand) THEN 'DISAMBIGUATION_CANDIDATES_CORRECT' END,
       |    CASE WHEN has_pred AND NOT eq AND NOT true_cand THEN 'DISAMBIGUATION_CANDIDATES_WRONG' END,
       |    CASE WHEN len(cands) > 1 AND true_cand AND eq THEN 'DISAMBIGUATION_MULTI_CANDIDATES_CORRECT' END,
       |    CASE WHEN len(cands) > 1 AND true_cand AND has_pred AND NOT eq
       |         THEN 'DISAMBIGUATION_MULTI_CANDIDATES_WRONG' END,
       |    CASE WHEN eq THEN 'HYPERLINK_CORRECT' ELSE 'HYPERLINK_WRONG' END,
       |    CASE WHEN eq THEN 'DISAMBIGUATION_CORRECT' END,
       |    CASE WHEN eq AND partial_name THEN 'DISAMBIGUATION_PARTIAL_NAME_CORRECT' END,
       |    CASE WHEN eq AND NOT partial_name THEN 'DISAMBIGUATION_OTHER_CORRECT' END,
       |    CASE WHEN has_pred THEN 'AVOIDED_NER_FN' END,
       |    CASE WHEN has_pred THEN 'AVOIDED_NER_FP_WRONG_SPAN' END,
       |    CASE WHEN has_pred AND non_named THEN 'AVOIDED_NER_FN_LOWERCASED' END,
       |    CASE WHEN NOT non_named AND strpos(surface, ' ') > 0 THEN 'AVOIDED_NER_FN_PARTIALLY_INCLUDED' END,
       |    CASE WHEN NOT non_named THEN 'AVOIDED_NER_FN_PARTIAL_OVERLAP' END,
       |    CASE WHEN NOT non_named AND has_pred THEN 'AVOIDED_NER_FN_OTHER' END
       |  ], x -> x IS NOT NULL)), ',') AS errors_ignored
       |  FROM derived)
       |SELECT url, CAST("begin" AS INTEGER) AS "begin", CAST("end" AS INTEGER) AS "end",
       |       surface AS text, CAST(1 AS INTEGER) AS factor,
       |       mention_type AS "mentionType",
       |       linking AS linking_ignored, linking AS linking_required,
       |       ner AS ner_ignored, errors_ignored
       |FROM errs
       |WHERE CASE WHEN (SELECT count(*) FROM m0
       |                 WHERE NOT regexp_full_match(gold_entity, 'E[0-9]+')) > 0
       |           THEN error('eval_cases oracle: non-E gold id would break the known-gt decision-table collapse')
       |      WHEN (SELECT count(*) FROM preds
       |            WHERE NOT regexp_full_match(pred_id, 'E[0-9]+')) > 0
       |           THEN error('eval_cases oracle: unknown predicted id would break the known-pred collapse')
       |      WHEN (SELECT count(*) FROM feats WHERE is_pron OR is_nom) > 0
       |           THEN error('eval_cases oracle: coreference-type surface present — the coref error-labeler branches (errors.py:195-221) are not derived here')
       |      WHEN (SELECT count(*) FROM preds p JOIN sp s
       |              ON p.url = s.url AND p."begin" = s."begin" AND p."end" = s."end"
       |            WHERE NOT EXISTS (SELECT 1 FROM labels l WHERE l.url = p.url AND
       |                    ((l."begin" = p."begin" AND l."end" = p."end") OR
       |                     (l.exp_begin = p."begin" AND l.exp_end = p."end") OR
       |                     (l."begin" = s.exp_begin AND l."end" = s.exp_end) OR
       |                     (l.exp_begin = s.exp_begin AND l.exp_end = s.exp_end)))) > 0
       |           THEN error('eval_cases oracle: prediction outside the ground-truth span universe (FD cases not derived)')
       |      ELSE TRUE END""".stripMargin
}
