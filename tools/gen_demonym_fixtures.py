#!/usr/bin/env python3
"""Golden fixture for the demonym-populated evaluation path: execute the
reference's demonym reader + case generator + error labelers with a crafted
demonym TSV and entity-type db, so the Scala side can prove the full
file -> MappingTables.demonyms -> ErrorMeta -> DISAMBIGUATION_DEMONYM_*
pipeline reproduces the reference label-for-label."""
import json, sys, types, importlib.util, os, tempfile

REF = "/root/reference/src"
sys.path.insert(0, REF)

for name in ["lmdb", "spacy", "spacy.tokens", "spacy.language"]:
    m = types.ModuleType(name)
    sys.modules[name] = m
sys.modules["spacy.tokens"].Doc = object
sys.modules["spacy.tokens"].Token = object
sys.modules["spacy.language"].Language = object
sys.modules["spacy"].load = lambda *a, **k: None
sys.modules["spacy"].tokens = sys.modules["spacy.tokens"]

settings = types.ModuleType("elevant.settings")
settings.TYPE_PERSON_QID = "Q215627"
settings.TYPE_FICTIONAL_CHARACTER_QID = "Q95074"
settings.TYPE_ORGANIZATION_QID = "Q43229"
settings.TYPE_LOCATION_QID = "Q27096213"
settings.TYPE_ETHNICITY_QID = "Q33829"
settings.TYPE_LANGUOID_QID = "Q17376908"
settings.__getattr__ = lambda name: "/dev/null"
import elevant
sys.modules["elevant.settings"] = settings
elevant.settings = settings

from elevant.models.article import article_from_json
from elevant.evaluation.case_generator import CaseGenerator
from elevant.evaluation.errors import label_errors
from elevant.evaluation.case import EvaluationMode
from elevant.helpers.entity_database_reader import EntityDatabaseReader

# ---- crafted demonym file, loaded via the REFERENCE reader --------------------
DEMONYM_TSV = (
    "Q183\tGerman\n"
    "Q30\tAmerican\n"
    "Q142\tFrench\n")
f = tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False, encoding="utf8")
f.write(DEMONYM_TSV)
f.close()
settings.QID_TO_DEMONYM_FILE = f.name
demonyms = EntityDatabaseReader.get_demonyms()   # incl. auto plurals

TYPE_DB = {
    "Q183": ["Q27096213"],          # Germany: location
    "Q30": ["Q27096213"],           # USA: location
    "Q142": ["Q27096213"],          # France: location
    "Q101244": ["Q33829"],          # Germans (people): ethnicity
    "Q1321": ["Q17376908"],         # Spanish (language): languoid
    "Q937": ["Q215627"],            # Einstein: person
    "Q64": ["Q27096213"],           # Berlin: location
}
NAMES = {"Q183": "Germany", "Q30": "United States", "Q142": "France",
         "Q101244": "Germans", "Q937": "Albert Einstein", "Q64": "Berlin",
         "Q1321": "Spanish"}

# alias -> most popular candidate set (drives is_rare_case / is_metonymy)
MOST_POPULAR = {
    "Turkey": {"Q43"},       # location entity is most popular for the bird word
    "Paris": {"Q90"},        # city most popular
    "Hilton": {"Q598747"},   # organization (hotel chain) most popular
}
TYPE_DB.update({
    "Q43": ["Q27096213"],        # Turkey (country): location
    "Q839581": ["Q16521"],       # turkey (bird): taxon -> not loc/person/ethnicity
    "Q90": ["Q27096213"],        # Paris: location
    "Q167646": ["Q215627"],      # Paris Hilton: person
    "Q598747": ["Q43229"],       # Hilton hotels: organization
    "Q3520007": ["Q43229"],      # some rare club: organization
})
NAMES.update({"Q43": "Turkey", "Q839581": "turkey", "Q90": "Paris",
              "Q167646": "Paris Whitney Hilton", "Q598747": "Hilton Worldwide",
              "Q3520007": "Paris Saint-Germain Esports"})

class FakeEntityDb:
    def is_demonym(self, t):
        return t in demonyms
    def get_entity_types(self, e):
        return TYPE_DB.get(e, [])
    def get_most_popular_candidate_for_hyperlink(self, a):
        return MOST_POPULAR.get(a, set())
    def get_entity_name(self, e):
        return NAMES.get(e, "Unknown")
    def is_quantity(self, e): return False
    def is_datetime(self, e): return False
    def contains_entity(self, e): return True

ARTICLES = [
    # DISAMBIGUATION_DEMONYM_CORRECT: "German" linked to the GT entity
    {"id": 0, "title": "demonym correct", "text": "The German market grew.\n\n",
     "evaluation_span": [0, 23],
     "labels": [{"id": 0, "span": [4, 10], "entity_id": "Q183", "name": "Germany",
                 "type": "Q27096213"}],
     "entity_mentions": [{"span": [4, 10], "id": "Q183", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q183", "Q101244"]}]},
    # DISAMBIGUATION_DEMONYM_WRONG: "American" linked to the wrong entity
    {"id": 1, "title": "demonym wrong", "text": "An American visited Berlin.\n\n",
     "evaluation_span": [0, 27],
     "labels": [{"id": 0, "span": [3, 11], "entity_id": "Q30",
                 "name": "United States", "type": "Q27096213"},
                {"id": 1, "span": [20, 26], "entity_id": "Q64", "name": "Berlin",
                 "type": "Q27096213"}],
     "entity_mentions": [{"span": [3, 11], "id": "Q101244", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q101244", "Q30"]},
                         {"span": [20, 26], "id": "Q64", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q64"]}]},
    # plural demonym via the reader's auto-plural key: "Germans"
    {"id": 2, "title": "plural demonym", "text": "Many Germans emigrated.\n\n",
     "evaluation_span": [0, 23],
     "labels": [{"id": 0, "span": [5, 12], "entity_id": "Q101244",
                 "name": "Germans", "type": "Q33829"}],
     "entity_mentions": [{"span": [5, 12], "id": "Q101244", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q101244"]}]},
    # demonym surface but PERSON-typed GT -> NOT a demonym case
    {"id": 3, "title": "demonym surface, person type",
     "text": "The composer German Ramirez played.\n\n", "evaluation_span": [0, 35],
     "labels": [{"id": 0, "span": [13, 19], "entity_id": "Q937",
                 "name": "Albert Einstein", "type": "Q215627"}],
     "entity_mentions": [{"span": [13, 19], "id": "Q937", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q937"]}]},
    # METONYMY_WRONG: GT is the bird (taxon), most-popular + prediction are
    # the location -> metonymy error
    {"id": 4, "title": "metonymy wrong", "text": "They ate Turkey for dinner.\n\n",
     "evaluation_span": [0, 27],
     "labels": [{"id": 0, "span": [9, 15], "entity_id": "Q839581",
                 "name": "turkey", "type": "Q16521"}],
     "entity_mentions": [{"span": [9, 15], "id": "Q43", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q43"]}]},
    # METONYMY_CORRECT: same shape, linked correctly
    {"id": 5, "title": "metonymy correct", "text": "They ate Turkey at noon.\n\n",
     "evaluation_span": [0, 24],
     "labels": [{"id": 0, "span": [9, 15], "entity_id": "Q839581",
                 "name": "turkey", "type": "Q16521"}],
     "entity_mentions": [{"span": [9, 15], "id": "Q839581", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q839581"]}]},
    # RARE_WRONG: GT is the rare entity (org), most-popular is another org,
    # prediction hit the popular one
    {"id": 6, "title": "rare wrong", "text": "The Hilton posted results.\n\n",
     "evaluation_span": [0, 26],
     "labels": [{"id": 0, "span": [4, 10], "entity_id": "Q3520007",
                 "name": "Paris Saint-Germain Esports", "type": "Q43229"}],
     "entity_mentions": [{"span": [4, 10], "id": "Q598747", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q598747"]}]},
    # RARE_CORRECT: rare GT linked correctly despite the popular candidate
    {"id": 7, "title": "rare correct", "text": "The Hilton won the cup.\n\n",
     "evaluation_span": [0, 23],
     "labels": [{"id": 0, "span": [4, 10], "entity_id": "Q3520007",
                 "name": "Paris Saint-Germain Esports", "type": "Q43229"}],
     "entity_mentions": [{"span": [4, 10], "id": "Q3520007", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q3520007"]}]},
    # PARTIAL_NAME_WRONG: mention 'Paris' inside multi-word GT name; the
    # metonymy check must lose to... (order: demonym > metonymy > partial
    # > rare) — GT is a person, so metonymy is excluded and partial fires
    {"id": 8, "title": "partial name wrong", "text": "Then Paris arrived late.\n\n",
     "evaluation_span": [0, 24],
     "labels": [{"id": 0, "span": [5, 10], "entity_id": "Q167646",
                 "name": "Paris Whitney Hilton", "type": "Q215627"}],
     "entity_mentions": [{"span": [5, 10], "id": "Q90", "recognized_by": "M",
                          "linked_by": "M", "candidates": ["Q90"]}]},
]

db = FakeEntityDb()
cg = CaseGenerator(db)
out = []
for art_json in ARTICLES:
    article = article_from_json(json.dumps(art_json))
    cases = cg.get_evaluation_cases(article)
    for mode in EvaluationMode:
        label_errors(article, cases, db, mode, contains_unknowns=True)
    out.append([c.to_dict() for c in cases])

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "golden")
os.makedirs(OUT, exist_ok=True)
golden = {
    "demonym_tsv": DEMONYM_TSV,
    "demonym_surfaces": sorted(demonyms.keys()),
    "type_db": TYPE_DB,
    "names": NAMES,
    "most_popular": {k: sorted(v) for k, v in MOST_POPULAR.items()},
    "articles": ARTICLES,
    "cases": out,
}
with open(os.path.join(OUT, "demonym_eval.json"), "w", encoding="utf8") as fh:
    json.dump(golden, fh, indent=1, ensure_ascii=False, sort_keys=True)
demon_labels = [l for doc in out for c in doc for m in ("IGNORED", "REQUIRED")
                for l in c["error_labels"][m] if "DEMONYM" in l]
print("wrote demonym_eval.json;", len(demon_labels), "demonym labels:", sorted(set(demon_labels)))
