package graft.model

import java.sql.Timestamp

/** Core record types of the engine (SURVEY.md §1.3).
  *
  * Schemas mirror the reference's data model re-expressed relationally:
  *   - Page  = the BASELINE.json `input_hint` table shape (Common-Crawl-style
  *     web page row); reference analog: one WikiExtractor JSONL line
  *     (/root/reference/src/elevant/models/article.py:13-39).
  *   - spans are named structs (begin, end) — half-open char offsets exactly
  *     like the reference's `(b, e)` tuples.
  */
final case class Span(begin: Int, end: Int)

final case class Hyperlink(begin: Int, end: Int, target: String)

final case class Section(begin: Int, end: Int, title: String)

/** Output of the deterministic HTML→text extraction (E1 in SURVEY.md §2.2);
  * reference: _process_extractor_text returns (text, hyperlinks,
  * title_synonyms, sections)
  * (/root/reference/src/elevant/helpers/wikipedia_dump_reader.py:58-167). */
final case class Extracted(
    text: String,
    hyperlinks: Seq[Hyperlink],
    titleSynonyms: Seq[Span],
    sections: Seq[Section])

/** One row of the input pages table — exactly the `input_hint` schema:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** A mention row: the exploded form of the reference's per-article
  * `entity_mentions` dict (article.py:64-74). `gold_entity` carries the
  * synthetic ground-truth entity for evaluation only — the ER pipeline
  * never reads it before the eval stage. */
final case class Mention(
    url: String,
    mention_id: Long,
    begin: Int,
    end: Int,
    surface: String,
    norm_surface: String,
    context: Seq[String],
    domain: String,
    gold_entity: String)

/** An undirected candidate edge between two mentions (ids ordered a < b). */
final case class Edge(a: Long, b: Long)

final case class ScoredPair(
    a: Long,
    b: Long,
    block_key: String,
    jw: Double,
    lev: Int,
    jaccard: Double,
    score: Double,
    is_match: Boolean)

final case class ClusterAssignment(mention_id: Long, cluster_id: Long)

/** Pairwise evaluation counters (micro P/R/F1 over labeled pairs at shared
  * blocking keys — BASELINE.json `metric`). */
final case class PairwiseEval(
    tp: Long,
    fp: Long,
    fn: Long,
    precision: Double,
    recall: Double,
    f1: Double)

/** Ground-truth label row — the reference's GroundtruthLabel
  * (/root/reference/src/elevant/evaluation/groundtruth_label.py:4-29) with
  * the parent/children forest encoded relationally. */
final case class Label(
    url: String,
    label_id: Int,
    begin: Int,
    end: Int,
    entity_id: String,
    name: String,
    parent: Option[Int],
    children: Seq[Int],
    optional: Boolean,
    types: Seq[String])

/** A prediction attached to a document for evaluation-case generation
  * (reference: EntityPrediction / EntityMention). */
final case class Pred(
    url: String,
    begin: Int,
    end: Int,
    entity_id: String,
    candidates: Seq[String])
