#!/usr/bin/env python3
"""Golden fixtures for graft.pipeline.WriteArticles by EXECUTING the
reference scripts/write_articles.py annotation builders + the main-loop
formatting steps on synthetic articles.

Run: python3 tools/gen_write_articles_fixtures.py
Writes src/test/resources/golden/write_articles.json
"""
import json, os, re, sys, importlib.util

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "src", "test", "resources", "golden")
os.makedirs(OUT, exist_ok=True)

# settings.py wants a data directory; point it at a temp dir via the
# relative config path it reads.
work = "/tmp/wa_fixture_work"
os.makedirs(os.path.join(work, "configs"), exist_ok=True)
os.makedirs("/tmp/wa_refdata", exist_ok=True)
with open(os.path.join(work, "configs", "elevant.config.json"), "w") as f:
    json.dump({"data_directory": "/tmp/wa_refdata"}, f)
os.chdir(work)
sys.path.insert(0, "/root/reference/src")

# entity_database pulls lmdb/spacy at import time; stub what we don't need
import types
for missing in ("lmdb", "spacy", "pynif", "rdflib", "markupsafe"):
    if missing not in sys.modules:
        m = types.ModuleType(missing)
        for attr in ("NIFCollection", "Graph", "URIRef", "Literal", "Namespace",
                     "Markup", "escape"):
            setattr(m, attr, object)  # attr lookups only; never instantiated
        sys.modules[missing] = m

spec = importlib.util.spec_from_file_location(
    "wa", "/root/reference/scripts/write_articles.py")
wa = importlib.util.module_from_spec(spec)
spec.loader.exec_module(wa)

from elevant.models.article import Article
from elevant.models.entity_mention import EntityMention
from elevant.evaluation.groundtruth_label import GroundtruthLabel


class StubDb:
    """Duck-typed EntityDatabase carrying only get_entity_name."""
    def __init__(self, names):
        self.names = names
    def get_entity_name(self, qid):
        return self.names[qid] if qid in self.names else "Unknown"


NAMES = {"Q1": "Alpha", "Q2": "Beta β", "Q3": "Gamma/Delta"}
DB = StubDb(NAMES)


def gt(lid, b, e, qid, parent=None, children=None, optional=False,
       typ="OTHER", desc=False):
    return GroundtruthLabel(lid, (b, e), qid, "name%d" % lid, parent=parent,
                            children=children, optional=optional, type=typ,
                            desc=desc)


def em(b, e, qid, linked_by="L"):
    return EntityMention((b, e), recognized_by="R", entity_id=qid,
                         linked_by=linked_by)


def main_format(article, text, entity_list, args):
    """Replicate write_articles.py main()'s per-article formatting
    (:199-263) using the module's own helpers."""
    if args.get("print_entity_list"):
        text += "\nACTUAL ENTITIES\n"
        for ent in entity_list:
            text += ent + "\n"
        text += "\nOTHER ENTITIES"
    separator = "\n"
    if args.get("one_article_per_line"):
        separator = ""
        text = text.replace("\n", " ")
        text = re.sub(r"\s", " ", text)
    out = ""
    if args.get("article_header"):
        article_title = article.title
        if args.get("ascii"):
            article_title = wa.replace_non_ascii_chars(article.title)
        out += "***** %s (%i) *****%s" % (article_title, article.id, separator)
    if args.get("ascii"):
        text = wa.replace_non_ascii_chars(text)
    out += text + "\n"
    return out


def file_name(article, seq, args):
    fn = "article_%05d" % seq
    if args.get("title_in_filename"):
        fn += "_" + article.title.replace(" ", "_").replace("/", "_")
    return fn + ".txt"


cases = []


def case(name, article, annotation, args, names_used=None):
    text = article.text
    if args.get("evaluation_span"):
        begin, end = article.evaluation_span
        text = text[begin:end] + "\n" if not text[begin:end] == text else text
    entity_list = []
    if annotation is not None:
        text, entity_list = wa.get_entity_text(
            article, DB, annotation, args.get("evaluation_span", False))
        if annotation in (wa.Annotation.LABELS, wa.Annotation.HYPERLINKS):
            entity_list = sorted(entity_list)  # reference: set, order undefined
    content = main_format(article, text, entity_list, args)
    cases.append({
        "name": name,
        "article": {
            "id": article.id,
            "title": article.title,
            "text": article.text,
            "eval_begin": article.evaluation_span[0],
            "eval_end": article.evaluation_span[1],
            "labels": [
                {"id": l.id, "begin": l.span[0], "end": l.span[1],
                 "entity_id": l.entity_id,
                 "parent": l.parent, "children": l.children or [],
                 "optional": l.optional, "type": l.type, "desc": bool(l.desc)}
                for l in article.labels],
            "mentions": [
                {"begin": s[0], "end": s[1], "entity_id": m.entity_id}
                for s, m in article.entity_mentions.items()],
            "hyperlinks": [
                {"begin": s[0], "end": s[1], "target": t}
                for s, t in article.hyperlinks],
            "title_synonyms": [
                {"begin": s[0], "end": s[1]} for s in article.title_synonyms],
        },
        "annotation": (annotation.name if annotation is not None else None),
        "entity_list_sorted": annotation in (wa.Annotation.LABELS,
                                             wa.Annotation.HYPERLINKS),
        "options": args,
        "expected_content": content,
        "expected_file": file_name(article, article.id, args),
        "expected_entities": entity_list,
    })


# ---- LABELS: nesting, optional, unknown, unicode names ---------------------
a1 = Article(id=0, title="Art One", text="Alpha met Beta in Ulm today.",
             labels=[gt(1, 0, 5, "Q1", children=[2]),
                     gt(2, 0, 5, "Q2", parent=1),
                     gt(3, 10, 14, "Q2"),
                     gt(4, 18, 21, "<NIL>"),
                     gt(5, 22, 27, "Q9", optional=True)])
case("labels_nested", a1, wa.Annotation.LABELS, {})
case("labels_nested_list", a1, wa.Annotation.LABELS, {"print_entity_list": True})
case("labels_header", a1, wa.Annotation.LABELS, {"article_header": True})

# evaluation span slicing (labels inside the span only — reference offsets)
a2 = Article(id=7, title="Spanned", text="Pre text. Alpha seen. Post.",
             evaluation_span=(10, 21),
             labels=[gt(1, 10, 15, "Q1")])
case("labels_evalspan", a2, wa.Annotation.LABELS, {"evaluation_span": True})
case("noann_evalspan", a2, None, {"evaluation_span": True})
case("noann_evalspan_full", Article(id=8, title="Full", text="All inside.",
                                    labels=[]), None, {"evaluation_span": True})

# ---- NER: root/non-optional/known only -------------------------------------
a3 = Article(id=1, title="Ner Art", text="Alpha met Beta in Ulm today.",
             labels=[gt(1, 0, 5, "Q1", children=[2]),
                     gt(2, 0, 5, "Q2", parent=1),
                     gt(3, 10, 14, "<NO_MAPPING>"),
                     gt(4, 18, 21, "Q3", optional=True),
                     gt(5, 22, 27, "Q1", typ="QUANTITY")])
case("ner_filtered", a3, wa.Annotation.NER, {})

# ---- LINKS: reverse-walk entity order, unknown skipped ----------------------
a4 = Article(id=2, title="Linked", text="Alpha met Beta and Alpha again.",
             entity_mentions=[em(0, 5, "Q1"), em(10, 14, "Q2"),
                              em(19, 24, "Q1"), em(25, 30, "<NIL>")])
case("links_order", a4, wa.Annotation.LINKS, {"print_entity_list": True})

# ---- HYPERLINKS: title-span overlap skip, [[t]] vs [[t|s]] ------------------
a5 = Article(id=3, title="Hyper Art", text="Hyper Art is linked to Ulm and Rome now.",
             hyperlinks=[((23, 26), "Ulm"), ((31, 35), "Roma")],
             title_synonyms=[(0, 9), (23, 26)])
case("hyperlinks_title", a5, wa.Annotation.HYPERLINKS, {})

a6 = Article(id=4, title="Overlap", text="Overlap zone here.",
             hyperlinks=[((0, 12), "Z")],
             title_synonyms=[(8, 12)])
case("hyperlinks_overlap_skip", a6, wa.Annotation.HYPERLINKS, {})

# ---- one-article-per-line: exotic whitespace --------------------------------
a7 = Article(id=5, title="Wide WS",
             text="line1\nline2 x y zw v\ttab end")
case("one_per_line_ws", a7, None, {"one_article_per_line": True})
case("one_per_line_header", a7, None,
     {"one_article_per_line": True, "article_header": True})

# ---- ascii: astral codepoint -> ONE underscore ------------------------------
a8 = Article(id=6, title="Ascii Tëst \U0001F600",
             text="Café \U0001F600 naïve résumé.")
case("ascii_astral", a8, None, {"ascii": True, "article_header": True})

# ---- WEXEA naming: title in filename, slash/space replacement ---------------
a9 = Article(id=9, title="A/B Title Nine", text="Nine.",
             hyperlinks=[((0, 4), "Nine")])
case("wexea_naming", a9, wa.Annotation.HYPERLINKS, {"title_in_filename": True})

with open(os.path.join(OUT, "write_articles.json"), "w", encoding="utf8") as f:
    json.dump(cases, f, ensure_ascii=False, indent=1)
print("wrote %d cases" % len(cases))
