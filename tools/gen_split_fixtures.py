#!/usr/bin/env python3
"""Golden fixture for the U5 dataset split (reference:
scripts/split_dataset.py:17-144): execute the reference's split logic on a
crafted corpus with fixed dev/test id lists that are PARTIALLY missing, so
the seed-42 shuffled fill-up branch is exercised. Also dumps MT19937
shuffle vectors so the Scala port of Python's random.shuffle is pinned."""
import json, os, random, sys, types, importlib.util, pickle, tempfile

REF = "/root/reference/src"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "golden")
os.makedirs(OUT, exist_ok=True)

# ---- MT19937 / shuffle pin vectors -------------------------------------------
vectors = {}
random.seed(42)
vectors["getrandbits32"] = [random.getrandbits(32) for _ in range(10)]
random.seed(42)
x = list(range(10)); random.shuffle(x); vectors["shuffle10"] = x
random.seed(42)
x = list(range(25)); random.shuffle(x)
y = list(range(7)); random.shuffle(y)
vectors["shuffle25_then7"] = {"first": x, "second": y}

# ---- crafted corpus + split run ------------------------------------------------
# 30 articles; dev ids [3, 99, 7] (99 missing), test ids [11, 12, 98, 97]
# (98, 97 missing); split_size 4 -> dev needs 2 fill-ups, test needs 2.
ARTICLES = [json.dumps({"id": i, "title": f"t{i}"}) + "\n" for i in range(30)]
DEV_IDS = [3, 99, 7]
TEST_IDS = [11, 12, 98, 97]
SPLIT_SIZE = 4

# Reimplementation of split_dataset.py:17-144 main-loop semantics with the
# file I/O inlined (the reference main needs the full elevant runtime; the
# logic below is a 1:1 transcription executed with the SAME python random).
random.seed(42)
dev_ids = list(DEV_IDS); dev_ids_set = set(dev_ids)
test_ids = list(TEST_IDS); test_ids_set = set(test_ids)
articles = []
found_dev = {}
found_test = {}
train_ids = []
for article in ARTICLES:
    j = json.loads(article)
    aid = j["id"]
    if aid in dev_ids_set:
        found_dev[aid] = article
    elif aid in test_ids_set:
        found_test[aid] = article
    else:
        train_ids.append(aid)
    articles.append(article)

random.shuffle(articles)
random.shuffle(train_ids)

if len(found_dev) < SPLIT_SIZE:
    while len(found_dev) < SPLIT_SIZE:
        aid = train_ids.pop()
        dev_ids.append(aid); dev_ids_set.add(aid); found_dev[aid] = None
if len(found_test) < SPLIT_SIZE:
    while len(found_test) < SPLIT_SIZE:
        aid = train_ids.pop()
        test_ids.append(aid); test_ids_set.add(aid); found_test[aid] = None

train_out, dev_out, test_out = [], [], []
for dev_id in dev_ids:
    a = found_dev.get(dev_id)
    if a is not None:
        dev_out.append(json.loads(a)["id"]); dev_ids_set.remove(dev_id)
for test_id in test_ids:
    a = found_test.get(test_id)
    if a is not None:
        test_out.append(json.loads(a)["id"]); test_ids_set.remove(test_id)

train_ids = set(train_ids)
for article in articles:
    aid = json.loads(article)["id"]
    if aid in dev_ids_set:
        dev_out.append(aid); dev_ids_set.remove(aid)
    elif aid in test_ids_set:
        test_out.append(aid); test_ids_set.remove(aid)
    elif aid in train_ids:
        train_out.append(aid)

golden = {
    "vectors": vectors,
    "n_articles": len(ARTICLES),
    "dev_ids": DEV_IDS,
    "test_ids": TEST_IDS,
    "split_size": SPLIT_SIZE,
    "train": train_out,
    "dev": dev_out,
    "test": test_out,
}
with open(os.path.join(OUT, "dataset_split.json"), "w") as f:
    json.dump(golden, f, indent=1, sort_keys=True)
print("dev:", dev_out, "test:", test_out, "n_train:", len(train_out))
