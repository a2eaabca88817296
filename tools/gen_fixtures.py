#!/usr/bin/env python3
"""Generate golden fixtures for the byte-identical extraction invariant by
EXECUTING the reference implementation at /root/reference (read-only).

Outputs JSON to src/test/resources/golden/. The Scala tests compare
graft.text.Extract against these captured behaviors.
"""
import json, sys, types, importlib.util, os

REF = "/root/reference/src"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "golden")
os.makedirs(OUT, exist_ok=True)

# Stub the package deps so we can import the single module without the full
# elevant runtime (settings needs data dirs we don't have).
elevant = types.ModuleType("elevant")
settings = types.ModuleType("elevant.settings")
models = types.ModuleType("elevant.models")
article_mod = types.ModuleType("elevant.models.article")
article_mod.ABSTRACT_INDICATOR = "ABSTRACT"
article_mod.Article = object
sys.modules["elevant"] = elevant
sys.modules["elevant.settings"] = settings
sys.modules["elevant.models"] = models
sys.modules["elevant.models.article"] = article_mod

spec = importlib.util.spec_from_file_location(
    "wdr", os.path.join(REF, "elevant/helpers/wikipedia_dump_reader.py"))
wdr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(wdr)
process = wdr.WikipediaDumpReader._process_extractor_text

# ---- extraction fixtures ----------------------------------------------------
inputs = [
    # plain text, no markup
    "Hello world.\n\nSecond paragraph.",
    # simple link
    'Albert <a href="Albert_Einstein">Einstein</a> was born in <a href="Ulm">Ulm</a>.',
    # bold title synonyms in first paragraph only
    "<b>AE</b> aka <b>Al</b>.\n\npara2 <b>NotSyn</b>x.\n\npara3 <b>Nope</b>.",
    # bold exactly at the two-paragraph boundary
    "a<b>x</b>\n\nb<b>y</b>\n\nc<b>z</b>",
    # sections
    "Abstract text.\nSection::::History.\nHistory text.\nSection::::Legacy.\nEnd.",
    # section with a tag inside the header (tags within section headers are skipped)
    'Intro.\nSection::::The <a href="X">X</a> era.\nBody.',
    # "not really a tag" guard: < x > with spaces on both sides of group(2)
    "The relation a < b > c holds. And < weird > brackets.",
    # link with URL-encoded target
    '<a href="Caf%C3%A9_de_Flore">Cafe</a> in Paris.',
    # link with quote-less href / malformed link tag
    "<a name=x>anchor</a> end.",
    # unclosed bold / unclosed link
    "start <b>bold never closed\n\nnext <a href=\"T\">link never closed",
    # nested-ish / stray closing tags
    "x</a>y</b>z",
    # link immediately followed by section
    '<a href="A">A</a>\nSection::::S1.\ntail',
    # empty input and single newline
    "",
    "\n",
    # consecutive sections, empty section bodies
    "\nSection::::A\nSection::::B\nend",
    # CRLF-ish content and tabs
    "line1\r\nline2\tend <a href=\"T%20X\">t x</a>",
    # percent signs that are not escapes
    '<a href="100%25_and_50%">pct</a> done',
    # unicode text + unicode percent escapes
    '<a href="M%C3%BCnchen">München</a> ist schön.',
    # bold inside link text
    '<a href="Q">the <b>Bold</b> one</a>.',
    # tag-like with slash variants
    "a </ b> c < /b> d </b > e",
    # many paragraphs then bold (must NOT be a synonym)
    "p1\n\np2\n\np3\n\np4 <b>late</b>.",
    # section at the very start
    "\nSection::::First\nbody only",
    # adjacent links
    '<a href="A">x</a><a href="B">y</a>',
]

ext = []
for t in inputs:
    text, links, syns, secs = process(t)
    ext.append({
        "input": t,
        "text": text,
        "hyperlinks": [[list(sp), tgt] for sp, tgt in links],
        "title_synonyms": [list(sp) for sp in syns],
        "sections": [[list(sp), title] for sp, title in secs],
    })
with open(os.path.join(OUT, "extract.json"), "w") as f:
    json.dump(ext, f, ensure_ascii=False, indent=1)

# ---- unquote fixtures --------------------------------------------------------
from urllib.parse import unquote
uq_inputs = [
    "plain", "a%20b", "%C3%BCber", "bad%zz", "%", "%2", "trail%2", "a+b",
    "%25", "%e2%82%ac", "%C3", "%C3x", "mix%C3%BC%41", "%41%42%43",
    "100%25_and_50%", "M%C3%BCnchen", "a%0Ab", "%F0%9F%98%80",
]
with open(os.path.join(OUT, "unquote.json"), "w") as f:
    json.dump([{"in": s, "out": unquote(s)} for s in uq_inputs], f,
              ensure_ascii=False, indent=1)

# ---- word_boundary fixtures ---------------------------------------------------
# import case_generator.word_boundary with stubbed deps
for name in ["elevant.evaluation", "elevant.evaluation.case",
             "elevant.evaluation.groundtruth_label", "elevant.models.entity_database",
             "elevant.models.entity_mention", "elevant.models.wikidata_entity",
             "elevant.utils", "elevant.utils.knowledge_base_mapper"]:
    m = types.ModuleType(name)
    sys.modules[name] = m
sys.modules["elevant.evaluation.case"].Case = object
sys.modules["elevant.evaluation.case"].EvaluationType = object
sys.modules["elevant.evaluation.case"].EvaluationMode = object
sys.modules["elevant.evaluation.groundtruth_label"].GroundtruthLabel = object
sys.modules["elevant.models.entity_database"].EntityDatabase = object
sys.modules["elevant.models.entity_mention"].EntityMention = object
sys.modules["elevant.models.wikidata_entity"].WikidataEntity = object
sys.modules["elevant.utils.knowledge_base_mapper"].UnknownEntity = object
sys.modules["elevant.utils.knowledge_base_mapper"].KnowledgeBaseMapper = object

spec2 = importlib.util.spec_from_file_location(
    "cg", os.path.join(REF, "elevant/evaluation/case_generator.py"))
cg = importlib.util.module_from_spec(spec2)
spec2.loader.exec_module(cg)
wb = cg.word_boundary

wb_cases = [
    ((0, 6), "Albert's birthplace is Ulm."),
    ((1, 19), '"Hearts and Flowers" is a song.'),
    ((0, 6), "Soviet-backed government."),
    ((3, 5), "ab cd ef"),
    ((0, 2), "ab"),
    ((1, 2), "ab"),
    ((0, 8), "word_end"),
    ((2, 4), 'a "bc" d'),
    ((3, 4), '"a" "b" c'),
    ((4, 6), "x1 y2z3 w"),
    ((0, 1), "a"),
    ((5, 7), "the \"quoted word\" end"),
    ((2, 3), "  spaced  "),
]
with open(os.path.join(OUT, "word_boundary.json"), "w") as f:
    json.dump([{"begin": s[0], "end": s[1], "text": t,
                "out": list(wb(s, t))} for s, t in wb_cases], f,
              ensure_ascii=False, indent=1)

print("fixtures written to", OUT)
