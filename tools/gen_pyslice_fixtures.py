#!/usr/bin/env python3
"""Golden vectors for CorpusJobs.pySlice: random (s, a, b) -> CPython s[a:b].
Indices range far outside [-len, len] to pin the clamp rules."""
import json, random
random.seed(1234)
cases = []
alphabet = "abcdefgh XY"
for _ in range(250):
    n = random.randint(0, 12)
    s = "".join(random.choice(alphabet) for _ in range(n))
    a = random.randint(-20, 20)
    b = random.randint(-20, 20)
    cases.append({"s": s, "a": a, "b": b, "out": s[a:b]})
with open("src/test/resources/golden/pyslice.json", "w") as f:
    json.dump(cases, f)
print(len(cases), "cases")
