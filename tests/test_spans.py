"""Duplicated-span stats (functions/spans.py) vs a plain-Python oracle."""

import numpy as np
import pyarrow as pa
import pytest

from dataxray.functions.spans import duplicated_span_stats


def _oracle(docs, k):
    spans = {}
    for did, text in docs:
        toks = [t for t in text.split() if t]
        spans[did] = {" ".join(toks[i:i + k])
                      for i in range(len(toks) - k + 1)}
    df = {}
    for s in spans.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    return {did: (len(s), sum(1 for g in s if df[g] >= 2))
            for did, s in spans.items() if s}


@pytest.mark.parametrize("blocks", [1, 32])
def test_dup_span_stats_matches_oracle(ray_session, blocks):
    import ray.data

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(60):
        words = list(rng.choice(vocab, rng.integers(0, 30)))
        docs.append((i, " ".join(words)))
    # force guaranteed cross-doc duplicate spans + short-doc edge cases
    docs.append((100, "a b c d e f g h"))
    docs.append((101, "x y a b c d e f z"))
    docs.append((102, "a b c"))       # shorter than k -> no spans
    docs.append((103, ""))            # empty
    k = 5
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })).repartition(blocks)
    got = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
           for r in duplicated_span_stats(ds, k=k).take_all()}
    want = _oracle(docs, k)
    assert got == want
    assert got[100][1] >= 1, "planted duplicate span must be detected"


@pytest.mark.parametrize("blocks", [1, 16])
def test_containment_pairs_planted(ray_session, blocks):
    """A is a strict prefix of B (containment(A in B)=1.0, reverse < 1);
    C is unrelated."""
    import ray.data

    from dataxray.functions.dedup import containment_pairs, shingles64

    base = " ".join(f"tok{i}" for i in range(30))
    big = base + " " + " ".join(f"extra{i}" for i in range(30))
    other = " ".join(f"zzz{i}" for i in range(40))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([base, big, other]),
    })).repartition(blocks)
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in containment_pairs(ds, threshold=0.8).take_all()}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (2, 1) not in got  # |S2 ∩ S1| / |S2| well below 0.8
    assert all(3 not in k for k in got)
    # exact ratio parity with the shingle sets
    s1 = set(shingles64(base, 3).tolist())
    s2 = set(shingles64(big, 3).tolist())
    assert got[(1, 2)] == len(s1 & s2) / len(s1)


@pytest.mark.parametrize("seed", [0, 1])
def test_containment_pairs_random_vs_bruteforce(ray_session, seed):
    """Random corpus with planted overlaps: the distributed prefix-filter
    join returns EXACTLY the brute-force containment pair set."""
    import numpy as np
    import ray.data

    from dataxray.functions.dedup import containment_pairs, shingles64

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(30):
        n = int(rng.integers(8, 25))
        docs.append(" ".join(rng.choice(vocab, size=n)))
    # plant: doc 30 = prefix of doc 5's text, doc 31 = doc 12 verbatim
    docs.append(" ".join(docs[5].split()[:10]))
    docs.append(docs[12])
    ids = list(range(len(docs)))
    t = 0.8
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(docs)})).repartition(7)
    got = {(r["id_a"], r["id_b"]) for r in
           containment_pairs(ds, threshold=t).take_all()}

    sets = {i: set(shingles64(d, 3).tolist()) for i, d in zip(ids, docs)}
    want = {(a, b) for a in ids for b in ids
            if a != b and sets[a]
            and len(sets[a] & sets[b]) / len(sets[a]) >= t}
    assert got == want
    assert (31, 12) in want  # the planted duplicates actually exercised
