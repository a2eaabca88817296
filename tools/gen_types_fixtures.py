#!/usr/bin/env python3
"""Golden fixtures for graft.sources.TypesMappings by EXECUTING the
reference AllTypesMappingCreator (create_all_types_mapping.py) and
extract_coreference_types (create_coreference_types_mapping.py) on a
synthetic type graph with diamonds, cycles, deep chains and coarse types.

Run: python3 tools/gen_types_fixtures.py
Writes src/test/resources/golden/types_mappings.json
"""
import importlib.util, json, logging, operator, os, sys, types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "src", "test", "resources", "golden")

work = "/tmp/types_fixture_work"
os.makedirs(os.path.join(work, "configs"), exist_ok=True)
data_dir = "/tmp/types_refdata"
os.makedirs(data_dir, exist_ok=True)
with open(os.path.join(work, "configs", "elevant.config.json"), "w") as f:
    json.dump({"data_directory": data_dir}, f)
os.chdir(work)
sys.path.insert(0, "/root/reference/src")
for missing in ("lmdb", "spacy", "pynif", "rdflib"):
    sys.modules.setdefault(missing, types.ModuleType(missing))


def load_script(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    mod.logger = logging.getLogger(name)  # scripts define logger in __main__
    spec.loader.exec_module(mod)
    mod.logger = logging.getLogger(name)
    return mod


atm = load_script("atm", "/root/reference/scripts/create_all_types_mapping.py")
ctm = load_script("ctm", "/root/reference/scripts/create_coreference_types_mapping.py")

# ---- synthetic type graph ---------------------------------------------------
# chain:    C1 < C2 < C3 < C4 < C5
# diamond:  D < Da, D < Db, Da < Dtop, Db < Dtop (Dtop min depth 2)
# shortcut: D < Dtop directly too -> Dtop min depth 1
# cycle:    X < Y, Y < X
# mixed:    M < C3 (joins the chain mid-way)
SUBCLASS = {
    "C1": {"C2"}, "C2": {"C3"}, "C3": {"C4"}, "C4": {"C5"},
    "D": {"Da", "Db", "Dtop"}, "Da": {"Dtop"}, "Db": {"Dtop"},
    "X": {"Y"}, "Y": {"X"},
    "M": {"C3"},
    # an ENTITY with its own subclass-of entries (merged at depth 0)
    "Q30": {"C1"},
}
INSTANCE = {
    "Q1": {"C1"},           # deep chain
    "Q2": {"D"},            # diamond + shortcut
    "Q3": {"X"},            # cycle
    "Q4": {"C3", "M"},      # two starts, shared superclasses at min depth
    "Q5": {"Zunknown"},     # class not in subclass map
    "Q30": {"D"},           # instance-of + own subclass-of merged
    "Q9": {"C1"},           # will be filtered by sitelinks
}
SITELINKS = {"Q1": 5, "Q2": 3, "Q3": 2, "Q4": 2, "Q5": 9, "Q30": 4,
             "Q9": 1,  # < min_count -> dropped
             "Q8": 7}  # relevant but no instance-of entry -> no output line

MIN_COUNT = 2
relevant = {q for q, c in SITELINKS.items() if c >= MIN_COUNT}
inst = {q: set(cs) for q, cs in INSTANCE.items() if q in relevant}

creator = atm.AllTypesMappingCreator(inst, {k: set(v) for k, v in SUBCLASS.items()})
lines = []
for qid, distinct_classes in creator.all_types_iterator():
    line = "%s" % qid
    for cls, depth in sorted(distinct_classes.items(), key=operator.itemgetter(1, 0)):
        line += "\t%d:%s" % (depth, cls)
    lines.append(line)

# ---- coreference types over that file ---------------------------------------
from elevant import settings
os.makedirs(os.path.dirname(settings.QID_TO_ALL_TYPES_FILE), exist_ok=True)
with open(settings.QID_TO_ALL_TYPES_FILE, "w", encoding="utf8") as f:
    for line in lines:
        f.write(line + "\n")

COARSE = {"C3", "Dtop"}
e2c = ctm.extract_coreference_types(COARSE)
coref_lines = ["%s\t%s" % (q, ";".join(ts)) for q, ts in e2c.items()]

out = {
    "sitelinks": sorted(SITELINKS.items()),
    "instance_of": sorted((q, c) for q, cs in INSTANCE.items() for c in cs),
    "subclass_of": sorted((q, c) for q, cs in SUBCLASS.items() for c in cs),
    "min_count": MIN_COUNT,
    "coarse": sorted(COARSE),
    "all_types_lines": sorted(lines),
    "coref_lines": sorted(coref_lines),
}
with open(os.path.join(OUT, "types_mappings.json"), "w", encoding="utf8") as f:
    json.dump(out, f, ensure_ascii=False, indent=1)
print("all_types:%d coref:%d" % (len(lines), len(coref_lines)))
for line in sorted(lines):
    print(" A:", line)
for line in sorted(coref_lines):
    print(" C:", line)
