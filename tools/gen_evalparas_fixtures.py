#!/usr/bin/env python3
"""Golden fixtures for graft.sources.EvalParagraphs by EXECUTING the
reference get_evaluation_paragraphs.py main body (CPython random with
seed 31072020, the real json2article/extraction, the real span
arithmetic copied line-for-line from the script).

Run: python3 tools/gen_evalparas_fixtures.py
Writes src/test/resources/golden/eval_paragraphs.json
"""
import json, os, random, sys, types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "src", "test", "resources", "golden")

work = "/tmp/evalparas_fixture_work"
os.makedirs(os.path.join(work, "configs"), exist_ok=True)
os.makedirs("/tmp/wa_refdata", exist_ok=True)
with open(os.path.join(work, "configs", "elevant.config.json"), "w") as f:
    json.dump({"data_directory": "/tmp/wa_refdata"}, f)
os.chdir(work)
sys.path.insert(0, "/root/reference/src")
for missing in ("lmdb", "spacy", "pynif", "rdflib"):
    sys.modules.setdefault(missing, types.ModuleType(missing))

from elevant.helpers.wikipedia_dump_reader import WikipediaDumpReader

N_PARAGRAPHS_PER_ARTICLE = 3
EVAL_START_TAG = "<START>"
EVAL_END_TAG = "<END>"


def para(i, n=1):
    return " ".join("p%d_w%d" % (i, w) for w in range(n + i % 3))


# enough articles that the shuffle is a non-trivial permutation; paragraph
# counts cover: <=4 paras (no draw), >4 (randint draw), trailing-empty,
# trailing NBSP-only (python strip discount), empty text, exactly 5
corpus = []
for i in range(12):
    n_paras = [1, 2, 5, 7, 4, 6, 9, 5, 3, 8, 10, 6][i]
    paras = [para(j + i * 10) for j in range(n_paras)]
    text = "\n\n".join(paras)
    if i == 3:
        text += "\n\n"          # trailing empty paragraph
    if i == 5:
        text += "\n\n  "   # trailing python-space-only paragraph
    corpus.append({"id": 100 + i, "title": "T%d" % i,
                   "url": "https://x/%d" % i, "text": text})
corpus.append({"id": 200, "title": "Empty", "url": "https://x/e", "text": ""})

articles = [WikipediaDumpReader.json2article(json.dumps(line)) for line in corpus]

# ---- reference main body (get_evaluation_paragraphs.py:17-46) --------------
random.seed(31072020)
random.shuffle(articles)
rows = []
text_blocks = []
for a_i, article in enumerate(articles):
    text = article.text
    paragraphs = text.split("\n\n")
    n_paragraphs = len(paragraphs)
    if len(paragraphs[-1].strip()) == 0:
        n_paragraphs = n_paragraphs - 1
    if n_paragraphs - 1 <= N_PARAGRAPHS_PER_ARTICLE:
        eval_begin_paragraph = 1
    else:
        eval_begin_paragraph = random.randint(1, n_paragraphs - N_PARAGRAPHS_PER_ARTICLE)
    eval_end_paragraph = min(len(paragraphs), eval_begin_paragraph + N_PARAGRAPHS_PER_ARTICLE)
    paragraph_lengths = [len(paragraph) for paragraph in paragraphs]
    start = sum(paragraph_lengths[:eval_begin_paragraph]) + 2 * eval_begin_paragraph
    end = start + sum(paragraph_lengths[eval_begin_paragraph:eval_end_paragraph]) + \
        2 * (eval_end_paragraph - eval_begin_paragraph - 1)
    article.set_evaluation_span(start, end)
    rows.append({"article_num": a_i + 1, "id": article.id,
                 "title": article.title, "url": article.url,
                 "eval_begin": start, "eval_end": end, "text": article.text})
    preceding = text[:start]
    eval_text = text[start:end]
    after = text[end:]
    text_blocks.append(
        "**** ARTICLE #%i: %s (%s) *****" % (a_i + 1, article.title, article.url)
        + "\n" + preceding + EVAL_START_TAG + eval_text + EVAL_END_TAG + after + "\n")

with open(os.path.join(OUT, "eval_paragraphs.json"), "w", encoding="utf8") as f:
    json.dump({"input": corpus, "rows": rows, "text_blocks": text_blocks},
              f, ensure_ascii=False, indent=1)
print("wrote %d rows" % len(rows))
