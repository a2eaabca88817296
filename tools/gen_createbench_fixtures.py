#!/usr/bin/env python3
"""Golden fixtures for the create_benchmark.py annotation parser, generated
by EXECUTING the reference at /root/reference (read-only).

Covers scripts/create_benchmark.py:
  - read_labeled_texts (ARTICLE delimiters, START/END tag stripping, n cap)
  - get_nested_labels: nesting + parent/children wiring, OPTIONAL/DESC/
    COREF/NO_COREF_ALT tags, Unknown -> <NIL>, the QID-prefix type rule
    (re.match), entity-name cell after ':', literal-bracket detection
    ([to] is text, not annotation), pos bookkeeping
  - the no_coref_variant / no_coref_alt deletion + delete_labels
    parent/children rewiring
"""
import json, sys, types, importlib.util, os

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "golden")
os.makedirs(OUT, exist_ok=True)

# ---- stub the elevant runtime so the script module imports ------------------
elevant = types.ModuleType("elevant")
settings = types.ModuleType("elevant.settings")
settings.__getattr__ = lambda name: "/nonexistent"
utils_pkg = types.ModuleType("elevant.utils")
log_mod = types.ModuleType("elevant.utils.log")
log_mod.setup_logger = lambda *a, **k: types.SimpleNamespace(
    info=lambda *x: None, warning=lambda *x: None, debug=lambda *x: None)
kbm_mod = types.ModuleType("elevant.utils.knowledge_base_mapper")
import enum
class UnknownEntity(enum.Enum):
    NO_MAPPING = "<NO_MAPPING>"
    NIL = "<NIL>"
kbm_mod.UnknownEntity = UnknownEntity
models_pkg = types.ModuleType("elevant.models")
article_mod = types.ModuleType("elevant.models.article")
article_mod.article_from_json = lambda j: None  # main() only; not exercised
eval_pkg = types.ModuleType("elevant.evaluation")

sys.modules.update({
    "elevant": elevant, "elevant.settings": settings,
    "elevant.utils": utils_pkg, "elevant.utils.log": log_mod,
    "elevant.utils.knowledge_base_mapper": kbm_mod,
    "elevant.models": models_pkg, "elevant.models.article": article_mod,
    "elevant.evaluation": eval_pkg,
})

# real GroundtruthLabel (self-contained)
spec = importlib.util.spec_from_file_location(
    "elevant.evaluation.groundtruth_label",
    f"{REF}/src/elevant/evaluation/groundtruth_label.py")
gl_mod = importlib.util.module_from_spec(spec)
sys.modules["elevant.evaluation.groundtruth_label"] = gl_mod
spec.loader.exec_module(gl_mod)

spec = importlib.util.spec_from_file_location(
    "create_benchmark", f"{REF}/scripts/create_benchmark.py")
cb = importlib.util.module_from_spec(spec)
sys.modules["create_benchmark"] = cb
spec.loader.exec_module(cb)

# ---- crafted annotated articles ---------------------------------------------
ANNOTATED = """**** ARTICLE 1 ****
<START>[Q76|Barack Obama] visited [Q64:Berlin City|Berlin] and [Unknown|Atlantis].
He [to] walked past [OPTIONAL:[DATETIME|next Monday]] quietly.<END>
**** ARTICLE 2 ****
<START>[Q937|Albert [Q183|German] Einstein] was born. [COREF:Q937|The [NO_COREF_ALT:Q5|physicist]] smiled.
[DESC:Q5|A human] appeared with [Q123abc|oddly named] things.<END>
**** ARTICLE 3 ****
<START>Nested deep: [Q1|aa [Q2|bb [Q3|cc] dd] ee [Q4|ff] gg].<END>
"""

texts = cb.read_labeled_texts_from_string if hasattr(cb, "read_labeled_texts_from_string") else None
# read_labeled_texts takes a path — write a temp file
import tempfile
tf = tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False)
tf.write(ANNOTATED)
tf.close()
labeled_texts = cb.read_labeled_texts(tf.name)
capped_texts = cb.read_labeled_texts(tf.name, n=2)

def label_to_dict(l):
    return {
        "id": l.id, "span": list(l.span), "entity_id": l.entity_id,
        "name": l.name, "parent": l.parent,
        "children": list(l.children) if l.children else [],
        "optional": bool(l.optional), "type": l.type,
        "coref": l.coref, "desc": bool(l.desc),
    }

out = {
    "annotated": ANNOTATED,
    "texts": labeled_texts,
    "texts_capped_2": capped_texts,
    "cases": [],
}
for text in labeled_texts:
    entry = {"labeled_text": text}
    for variant, kwargs in [
        ("default", {}),
        ("no_coref_variant", {"no_coref_variant": True}),
        ("no_coref_tags", {"no_coref_tags": True}),
    ]:
        labels = cb.get_nested_labels(text, **kwargs)
        entry[variant] = [label_to_dict(l) for l in labels]
    out["cases"].append(entry)

with open(os.path.join(OUT, "create_benchmark.json"), "w") as f:
    json.dump(out, f, indent=1)
print("wrote", os.path.join(OUT, "create_benchmark.json"),
      "cases:", len(out["cases"]))
