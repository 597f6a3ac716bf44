"""Fixed-point TextRank (functions/text.py:textrank_keywords) — a
python reference model replays the exact integer-micro-unit iteration
((pr*w*85) DIV (wdeg*100), base 150000) on a crafted corpus; dangling
words hold the base; ordering is (score DESC, word ASC)."""

from collections import defaultdict

from clickhouse_sinker_spark.functions.text import textrank_keywords


def _model(texts, iterations=3):
    edges = defaultdict(int)
    nodes = set()
    for t in texts:
        toks = [w for w in t.split() if w]
        nodes.update(toks)
        for a, b in zip(toks, toks[1:]):
            if a != b:
                edges[(a, b)] += 1
                edges[(b, a)] += 1
    wdeg = defaultdict(int)
    for (s, _), w in edges.items():
        wdeg[s] += w
    pr = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        nxt = {n: 150_000 for n in nodes}
        for (s, d), w in edges.items():
            nxt[d] += (pr[s] * w * 85) // (wdeg[s] * 100)
        pr = nxt
    return pr


def test_textrank_matches_python_model(spark):
    texts = [
        "hub a hub b hub c leaf",
        "a b c a b",
        "solo",
        "hub c hub",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["word"]: r["score"]
           for r in textrank_keywords(df, "text", 3, 20).collect()}
    exp = _model(texts, 3)
    assert got == exp
    # 'solo' is isolated: holds the dangling base after every iteration
    assert got["solo"] == 150_000
    # well-connected words outrank the leaf and the isolate
    assert exp["hub"] > exp["leaf"] and exp["c"] > exp["leaf"]


def test_textrank_determinism_and_topk(spark):
    texts = ["x y x y x", "y z"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    r1 = [(r["word"], r["score"]) for r in textrank_keywords(df, "text", 3, 2).collect()]
    r2 = [(r["word"], r["score"]) for r in textrank_keywords(df, "text", 3, 2).collect()]
    assert r1 == r2 and len(r1) == 2
    exp = _model(texts, 3)
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert r1 == top
