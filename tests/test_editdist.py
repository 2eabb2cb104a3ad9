"""Edit-distance-1 join (functions/editdist.py) and the tree_aggregate
single-block combine regression."""

import numpy as np
import pyarrow as pa
import pytest

from dataxray.functions.editdist import lev1_pairs, within_one


def test_within_one_cases():
    assert within_one("abc", "abd")          # substitution
    assert within_one("abc", "ab")           # delete last char
    assert within_one("abc", "bc")           # delete first char
    assert within_one("abc", "abcd")         # append
    assert within_one("abc", "xabc")         # prepend
    assert not within_one("abc", "abc")      # equal -> distance 0
    assert not within_one("abc", "axd")      # distance 2
    assert not within_one("abc", "abcde")    # length gap 2
    assert not within_one("ab", "ba")        # transposition = distance 2


def _oracle_pairs(names):
    def lev(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[lb]

    uniq = sorted(set(names))
    return sorted((a, b) for i, a in enumerate(uniq)
                  for b in uniq[i + 1:] if lev(a, b) == 1)


@pytest.mark.parametrize("blocks", [1, 32])
def test_lev1_pairs_matches_dp_oracle(ray_session, blocks):
    import ray.data

    rng = np.random.default_rng(11)
    base = ["".join(rng.choice(list("abcd"), rng.integers(1, 8)))
            for _ in range(120)]
    names = base + base[:30]  # duplicates must collapse first
    ds = ray.data.from_arrow(
        pa.table({"s": pa.array(names)})).repartition(blocks)
    got = sorted((r["name_a"], r["name_b"])
                 for r in lev1_pairs(ds, "s").take_all())
    assert got == _oracle_pairs(names)
    assert got, "test corpus should produce at least one distance-1 pair"


def test_tree_aggregate_single_block_multi_rowgroup(ray_session, tmp_path):
    """Regression: a fused parquet read yields one partial PER ROW GROUP,
    concatenated into a single output block when the file is read as one
    block — tree_aggregate used to skip the merge when len(refs)==1 and
    return the uncombined per-row-group partials (observed on lineitem at
    sf0.01: 6 row groups -> 18 rows instead of 3)."""
    import pyarrow.parquet as pq
    import ray.data

    from dataxray.stages.hashagg import tree_aggregate

    t = pa.table({"k": pa.array(["a", "b"] * 500),
                  "v": pa.array(np.arange(1000, dtype=np.int64))})
    path = str(tmp_path / "rg.parquet")
    pq.write_table(t, path, row_group_size=100)  # 10 row groups
    ds = ray.data.read_parquet(path, override_num_blocks=1)

    def partial(b: pa.Table) -> pa.Table:
        return pa.TableGroupBy(b, ["k"]).aggregate([("v", "sum")])

    out = tree_aggregate(ds, ["k"], partial, {"v_sum": "sum"})
    rows = {r["k"]: r["v_sum"] for r in out.take_all()}
    assert len(rows) == 2, f"per-row-group partials leaked: {rows}"
    assert rows["a"] == int(np.arange(0, 1000, 2).sum())
    assert rows["b"] == int(np.arange(1, 1000, 2).sum())


def test_tree_distinct_survives_zero_column_blocks(ray_session):
    """Regression: Ray emits ZERO-COLUMN empty blocks for empty shuffle
    partitions, and map_batches passes 0-row blocks through uncalled —
    so schema-less blocks reach the merge tree. A fanin group made only
    of them used to crash _combine_once with ArrowInvalid (No match for
    FieldRef)."""
    import ray
    import ray.data

    from dataxray.stages.hashagg import tree_distinct

    good = pa.table({"id_a": pa.array([1, 1, 2], pa.int64()),
                     "id_b": pa.array([2, 2, 3], pa.int64()),
                     "cosine": pa.array([0.9, 0.9, 0.8], pa.float64())})
    alien = pa.table({})  # what an empty shuffle partition emits
    # enough empty blocks that one merge group (fanin=8) is all-empty
    refs = [ray.put(good)] + [ray.put(alien) for _ in range(17)]
    ds = ray.data.from_arrow_refs(refs)
    out = tree_distinct(ds, ["id_a", "id_b"], combine={"cosine": "max"})
    rows = sorted((r["id_a"], r["id_b"], r["cosine"]) for r in out.take_all())
    assert rows == [(1, 2, 0.9), (2, 3, 0.8)]
