#!/usr/bin/env python3
"""Golden fixtures for graft.sources.CorpusJobs by EXECUTING the reference:
NewscrawlDumpReader.json2article, WikipediaDumpReader.json2article,
Article.get_abstract_span, get_wikipedia_id_to_title_mapping's main loop and
create_abstracts_mapping's main loop (with a duck-typed entity db running the
REAL EntityDatabase.link2id / KnowledgeBaseMapper.get_wikidata_qid code).

Run: python3 tools/gen_corpus_fixtures.py
Writes src/test/resources/golden/corpus_jobs.json
"""
import json, os, sys, types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "src", "test", "resources", "golden")

work = "/tmp/corpus_fixture_work"
os.makedirs(os.path.join(work, "configs"), exist_ok=True)
os.makedirs("/tmp/wa_refdata", exist_ok=True)
with open(os.path.join(work, "configs", "elevant.config.json"), "w") as f:
    json.dump({"data_directory": "/tmp/wa_refdata"}, f)
os.chdir(work)
sys.path.insert(0, "/root/reference/src")
for missing in ("lmdb", "spacy", "pynif", "rdflib"):
    if missing not in sys.modules:
        sys.modules[missing] = types.ModuleType(missing)

from elevant.helpers.wikipedia_dump_reader import WikipediaDumpReader
from elevant.helpers.newscrawl_dump_reader import NewscrawlDumpReader
from elevant.models.entity_database import EntityDatabase
from elevant.utils.knowledge_base_mapper import KnowledgeBaseMapper, KnowledgeBaseName

out = {}

# ---- newscrawl json2article -------------------------------------------------
news_lines = [
    {"id": "2019.01.0.12", "date": "2019-01-05",
     "text": "First para line1\nstill first\n\nSecond para.\n\nThird."},
    {"id": "777", "date": "2020-12-31", "text": "Single para only"},
    {"id": "8.8.8", "date": "d", "text": "\n\nStarts empty."},
    {"id": "9", "date": "", "text": ""},
    {"id": "10.5", "date": "2021-07-01", "text": "Köln traf Bonn\n\nrest"},
]
out["newscrawl"] = []
for line in news_lines:
    a = NewscrawlDumpReader.json2article(json.dumps(line))
    out["newscrawl"].append({
        "input": line, "id": a.id, "title": a.title, "text": a.text})

# ---- wikipedia json2article (extraction parity on the corpus path) ----------
wiki_lines = [
    {"id": 12, "title": "Alpha", "url": "https://en.wikipedia.org/wiki/Alpha",
     "text": "Alpha\n\n<b>Alpha</b> links to <a href=\"Beta_Page\">Beta</a>."
             "\nSection::::History.\nOld text."},
    {"id": 5, "title": "Gamma", "url": "u2",
     "text": "Gamma\n\nPlain."},
]
out["wikipedia"] = []
for line in wiki_lines:
    a = WikipediaDumpReader.json2article(json.dumps(line))
    out["wikipedia"].append({
        "input": line, "id": a.id, "title": a.title, "text": a.text,
        "url": a.url,
        "hyperlinks": [[list(s), t] for s, t in a.hyperlinks],
        "title_synonyms": [list(s) for s in a.title_synonyms],
        "sections": [[list(s), t] for s, t in (a.sections or [])]})

# ---- id -> title mapping (script main loop) ---------------------------------
idt_lines = [
    {"id": 30, "title": "Cee", "url": "u", "text": "Cee\n\nc."},
    {"id": 10, "title": "Aye", "url": "u", "text": "Aye\n\na."},
    {"id": 20, "title": "Bee", "url": "u", "text": "Bee\n\nb."},
    {"id": 10, "title": "Aye Two", "url": "u", "text": "Aye2\n\na."},  # dup id: last wins
]
m = dict()
for line in idt_lines:
    a = WikipediaDumpReader.json2article(json.dumps(line))
    m[a.id] = a.title
out["id_title"] = {
    "input": idt_lines,
    "lines": ["%s\t%s" % (str(i), t) for i, t in sorted(m.items())]}

# ---- abstracts mapping ------------------------------------------------------
# duck-typed entity db running the REAL link2id
class StubDb:
    def __init__(self, w2w, redirects):
        self.wikipedia2wikidata = w2w
        self.redirects = redirects
StubDb.link2id = EntityDatabase.link2id

W2W = {"Beta Page": "Q2", "Flore": "Q7", "Cafe one": "Q8", "Aye": "Q10",
       "Lower title": "Q11", "Coord Place": "Q12", "NoGap": "Q13",
       "Dup Target": "Q14", "Aye Two": "Q15"}
REDIR = {"Beta": "Beta Page", "Old Flore": "Flore", "lower title": "Missing"}
DB = StubDb(W2W, REDIR)

abs_lines = [
    # plain abstract, title with underscore -> space
    {"id": 1, "title": "Beta_Page", "url": "u",
     "text": "Beta Page\n\nBeta abstract text.\nMore abstract.\nSection::::H.\nBody."},
    # redirect resolution (Beta -> Beta Page)
    {"id": 2, "title": "Beta", "url": "u",
     "text": "Beta\n\nRedirected abstract.\nSection::::H.\nB."},
    # slash truncation + percent decoding: Cafe%20one -> "Cafe one"
    {"id": 3, "title": "wiki/Cafe%20one", "url": "u",
     "text": "Cafe\n\nCafe abstract.\nSection::::H.\nB."},
    # lowercase first letter -> capitalized variant direct hit
    {"id": 4, "title": "lower_title", "url": "u",
     "text": "lower\n\nLower abstract.\nSection::::H.\nB."},
    # unmapped -> NO_MAPPING, dropped
    {"id": 5, "title": "Unmapped Thing", "url": "u",
     "text": "U\n\nUnmapped abstract.\nSection::::H.\nB."},
    # NIL form -> dropped
    {"id": 6, "title": "<NIL>", "url": "u",
     "text": "n\n\nNil abstract.\nSection::::H.\nB."},
    # coordinate filter: first line < 60 chars with degree sign
    {"id": 7, "title": "Coord_Place", "url": "u",
     "text": "Coord Place\n\n48°51'N 2°21'E\nReal abstract after coords.\nSection::::H.\nB."},
    # no blank line in first section: title_end = 1 quirk
    {"id": 8, "title": "NoGap", "url": "u",
     "text": "NoGap starts immediately.\nSection::::H.\nB."},
    # duplicate qid: LAST wins (multi-mapping overwrite)
    {"id": 9, "title": "Dup_Target", "url": "u",
     "text": "Dup\n\nFirst dup abstract.\nSection::::H.\nB."},
    {"id": 10, "title": "Dup Target", "url": "u",
     "text": "Dup\n\nSecond dup abstract.\nSection::::H.\nB."},
    # unicode + strip behavior (leading NBSP in abstract)
    {"id": 11, "title": "Aye", "url": "u",
     "text": "Aye\n\n  Nbsp-led abstract \nSection::::H.\nB."},
]

e2a = {}
mapping_errors = 0
multi = 0
spans = []
for line in abs_lines:
    a = WikipediaDumpReader.json2article(json.dumps(line))
    span = a.get_abstract_span()
    abstract = a.text[span[0]:span[1]].strip()
    spans.append({"title": line["title"], "text": a.text,
                  "sections": [[list(s), t] for s, t in (a.sections or [])],
                  "span": list(span)})
    qid = KnowledgeBaseMapper.get_wikidata_qid(a.title, DB,
                                               kb_name=KnowledgeBaseName.WIKIPEDIA)
    if not KnowledgeBaseMapper.is_unknown_entity(qid):
        if qid in e2a:
            multi += 1
        e2a[qid] = (a.title, abstract.replace("\n", " "))
    else:
        mapping_errors += 1

out["abstracts"] = {
    "input": abs_lines,
    "title2qid": [[k, v] for k, v in W2W.items()],
    "redirects": [[k, v] for k, v in REDIR.items()],
    "spans": spans,
    "mapping_errors": mapping_errors,
    "multi_mapping_errors": multi,
    "lines": ["%s\t%s\t%s" % (q, t, ab) for q, (t, ab) in sorted(e2a.items())]}

with open(os.path.join(OUT, "corpus_jobs.json"), "w", encoding="utf8") as f:
    json.dump(out, f, ensure_ascii=False, indent=1)
print("newscrawl:%d wikipedia:%d idtitle:%d abstracts:%d (err=%d multi=%d)" % (
    len(out["newscrawl"]), len(out["wikipedia"]),
    len(out["id_title"]["lines"]), len(out["abstracts"]["lines"]),
    mapping_errors, multi))
