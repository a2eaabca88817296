#!/usr/bin/env python3
"""Execute the reference's case generator + error labelers on the
error-category example benchmark (stubbed EntityDatabase) to check whether
the shipped eval_cases golden matches the CURRENT reference code."""
import json, sys, types, importlib.util, os

REF = "/root/reference/src"
sys.path.insert(0, REF)


# stub lmdb + spacy before any elevant import
for name in ["lmdb", "spacy", "spacy.tokens", "spacy.language"]:
    m = types.ModuleType(name)
    sys.modules[name] = m
sys.modules["spacy.tokens"].Doc = object
sys.modules["spacy.tokens"].Token = object
sys.modules["spacy.language"].Language = object
sys.modules["spacy"].load = lambda *a, **k: None
sys.modules["spacy"].tokens = sys.modules["spacy.tokens"]

# stub settings (imports files we don't have)
settings = types.ModuleType("elevant.settings")
settings.TYPE_PERSON_QID = "Q215627"
settings.TYPE_FICTIONAL_CHARACTER_QID = "Q95074"
settings.TYPE_ORGANIZATION_QID = "Q43229"
settings.TYPE_LOCATION_QID = "Q27096213"
settings.TYPE_ETHNICITY_QID = "Q33829"
settings.TYPE_LANGUOID_QID = "Q17376908"
settings.WHITELIST_FILE = "/dev/null"
settings.__getattr__ = lambda name: "/dev/null"  # PEP 562 catch-all
settings.EXTRACTED_WIKIPEDIA_ARTICLES = "/dev/null"
import elevant
sys.modules["elevant.settings"] = settings
elevant.settings = settings

# stub spacy + pynif-free imports if needed
class FakeEntityDb:
    def is_demonym(self, t): return False
    def get_entity_types(self, e): return []
    def get_most_popular_candidate_for_hyperlink(self, a): return set()
    def get_entity_name(self, e): return "Unknown"
    def is_quantity(self, e): return False
    def is_datetime(self, e): return False
    def contains_entity(self, e): return True

from elevant.models.article import article_from_json
from elevant.evaluation.case_generator import CaseGenerator
from elevant.evaluation.errors import label_errors
from elevant.evaluation.case import EvaluationMode

db = FakeEntityDb()
cg = CaseGenerator(db)

arts = open("/root/reference/evaluation-webapp/example-benchmark/"
            "example.error-category-examples.linked_articles.jsonl").readlines()
out = []
for line in arts:
    article = article_from_json(line)
    cases = cg.get_evaluation_cases(article)
    for mode in EvaluationMode:
        label_errors(article, cases, db, mode, contains_unknowns=True)
    out.append([c.to_dict() for c in cases])

os.makedirs("src/test/resources/golden", exist_ok=True)
json.dump(out, open("src/test/resources/golden/error_cascade.json", "w"), indent=1)
json.dump(out, open("/tmp/reference_labeler_out.json", "w"))
print("wrote", sum(len(c) for c in out), "cases")
# diff vs shipped golden for doc 5 span [21,31]
golden = json.loads(open("/root/reference/evaluation-webapp/example-benchmark/"
                         "example.error-category-examples.eval_cases.jsonl").readlines()[5])
for c in out[5]:
    if c["span"] == (21, 31) or c["span"] == [21, 31]:
        print("CURRENT CODE REQUIRED:", sorted(c["error_labels"]["REQUIRED"]))
for c in golden:
    if c["span"] == [21, 31]:
        print("SHIPPED GOLDEN REQUIRED:", sorted(c["error_labels"]["REQUIRED"]))
