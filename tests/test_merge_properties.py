"""Randomized semantic checks for the newest, most clause-intricate
operators:

1. MERGE INTO vs an independent pandas reference model — randomized
   clause conditions/sets over seeded data, first-match-wins and
   cardinality semantics re-derived row-at-a-time in pandas (a totally
   different evaluation strategy than the Spark full-outer-join plan).

2. Metamorphic manifest equivalence — the SAME sequence of table
   operations (merge runs, row-level DELETE, MERGE, RESTORE) executed
   under inline manifests and under forced-checkpoint manifests
   (MYCARELY_MANIFEST_INLINE_MAX=0) must produce IDENTICAL table contents
   at every version. Any divergence in overlay/serialize/hydrate logic
   between the two formats flips the comparison.

Seeded loops rather than hypothesis: each Spark example costs seconds, so
a handful of seeded scenarios beats shrinking over hundreds."""

from __future__ import annotations

import random
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def target_root(tmp_path):
    p = str(tmp_path / "t")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _mk_spec(name):
    from mycarely_saas_dbt_spark.incremental import ModelSpec

    def boot(sp, sfd, wm):
        return sp.createDataFrame(
            [(i, i % 4, float(i * 10)) for i in range(40)],
            "k long, part long, v double",
        ).repartition(4, "k")

    return ModelSpec(name, "k", "k", boot, partition_by=["part"])


def _pandas_merge_reference(tgt: pd.DataFrame, src: pd.DataFrame, scenario):
    """Row-at-a-time MERGE semantics: first matching clause wins."""
    upd_cond, del_cond, ins_cond = scenario
    out_rows = []
    matched_keys = set(tgt.k) & set(src.k)
    src_by_k = {r.k: r for r in src.itertuples()}
    for r in tgt.itertuples():
        if r.k in matched_keys:
            s = src_by_k[r.k]
            if del_cond(r, s):
                continue  # first clause: delete
            if upd_cond(r, s):
                out_rows.append({"k": r.k, "part": r.part, "v": s.sv})
                continue
            out_rows.append({"k": r.k, "part": r.part, "v": r.v})  # keep
        else:
            out_rows.append({"k": r.k, "part": r.part, "v": r.v})
    for s in src.itertuples():
        if s.k not in set(tgt.k) and ins_cond(s):
            out_rows.append({"k": s.k, "part": s.k % 4, "v": s.sv})
    return (
        pd.DataFrame(out_rows, columns=["k", "part", "v"])
        .sort_values("k")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_merge_matches_pandas_reference(spark, target_root, seed):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    rng = random.Random(seed)
    mod_u, mod_d, mod_i = (
        rng.choice([2, 3, 5]),
        rng.choice([7, 11, 13]),
        rng.choice([2, 3]),
    )
    runner = IncrementalRunner(spark, target_root)
    spec = _mk_spec(f"pm{seed}")
    runner.run(spec, SF_DIR)

    # source: overlap half the keys, add some new ones (same part rule)
    src_rows = [(k, float(k + 1000)) for k in range(20, 60) if k % 2 == seed % 2]
    src = spark.createDataFrame(src_rows, "k long, sv double")
    runner.merge_into(
        spec,
        src,
        on="t.k = s.k",
        matched=[
            ("delete", f"s.k % {mod_d} = 0"),
            ("update", f"s.k % {mod_u} = 0", {"v": "s.sv"}),
        ],
        not_matched=[
            ("insert", f"s.k % {mod_i} = 0", {
                "k": "s.k", "part": "s.k % 4", "v": "s.sv",
            }),
        ],
    )
    got = (
        runner.read_target(spec.name)
        .orderBy("k")
        .toPandas()[["k", "part", "v"]]
        .reset_index(drop=True)
    )

    tgt = pd.DataFrame(
        [(i, i % 4, float(i * 10)) for i in range(40)],
        columns=["k", "part", "v"],
    )
    srcp = pd.DataFrame(src_rows, columns=["k", "sv"])
    want = _pandas_merge_reference(
        tgt,
        srcp,
        (
            lambda r, s: s.k % mod_u == 0,
            lambda r, s: s.k % mod_d == 0,
            lambda s: s.k % mod_i == 0,
        ),
    )
    # first-match-wins: delete clause precedes update in BOTH models
    want_d = {
        (int(r.k), int(r.part), float(r.v)) for r in want.itertuples()
    }
    got_d = {(int(r.k), int(r.part), float(r.v)) for r in got.itertuples()}
    assert got_d == want_d, f"seed={seed} mods=({mod_u},{mod_d},{mod_i})"


def _apply_op_sequence(runner, spec, spark, seed):
    """A deterministic mixed workload: boot, one-partition merge run,
    row-level DELETE, multi-clause MERGE, RESTORE to v2."""
    from pyspark.sql import functions as F  # noqa: F401

    rng = random.Random(seed)
    runner.run(spec, SF_DIR)  # v1
    redo = rng.randrange(4)

    def b_redo(sp, sfd, wm):
        return sp.createDataFrame(
            [(i, i % 4, float(i + 500)) for i in range(40) if i % 4 == redo],
            "k long, part long, v double",
        )

    import dataclasses

    runner.run(dataclasses.replace(spec, build=b_redo), SF_DIR)  # v2
    runner.delete_where(spec, f"k % {rng.choice([5, 7])} = 0")  # v3
    src = spark.createDataFrame(
        [(k, float(k)) for k in range(30, 50)], "k long, sv double"
    )
    runner.merge_into(  # v4
        spec,
        src,
        on="t.k = s.k",
        matched=[("update", None, {"v": "s.sv"})],
        not_matched=[("insert", None, {"k": "s.k", "part": "s.k % 4", "v": "s.sv"})],
    )
    runner.restore(spec.name, 2)  # v5


def _state(runner, name, version=None):
    df = runner.read_target(name, version=version)
    return sorted(
        (int(r["k"]), int(r["part"]), float(r["v"])) for r in df.collect()
    )


@pytest.mark.parametrize("seed", [11, 12])
def test_inline_and_checkpointed_manifests_are_equivalent(
    spark, tmp_path, seed, monkeypatch
):
    """Metamorphic: same op sequence, two manifest formats, identical
    contents at CURRENT and at every retained version; the checkpointed
    run must actually have used segments."""
    import json
    import os

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    roots = {}
    for mode, inline_max in (("inline", "999999"), ("seg", "0")):
        monkeypatch.setenv("MYCARELY_MANIFEST_INLINE_MAX", inline_max)
        root = str(tmp_path / mode)
        runner = IncrementalRunner(spark, root)
        runner.RETAIN_VERSIONS = 10  # keep every version comparable
        spec = _mk_spec("eq")
        _apply_op_sequence(runner, spec, spark, seed)
        roots[mode] = runner

    ri, rs = roots["inline"], roots["seg"]
    assert _state(ri, "eq") == _state(rs, "eq")
    vi, vs = ri.list_versions("eq"), rs.list_versions("eq")
    assert vi == vs
    for v in vi:
        assert _state(ri, "eq", version=v) == _state(rs, "eq", version=v), v
    # the segmented run really checkpointed
    last = vs[-1]
    p = os.path.join(rs._manifest_dir("eq"), f"v{last:06d}.json")
    with open(p) as fh:
        j = json.load(fh)
    assert j.get("segments"), "forced-checkpoint run produced no segments"
    # and the inline run really stayed inline
    p = os.path.join(ri._manifest_dir("eq"), f"v{last:06d}.json")
    with open(p) as fh:
        assert "segments" not in json.load(fh)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_insert_only_merge_with_duplicate_sources_matches_reference(
    spark, target_root, seed
):
    """ADVICE r8 regression class, randomized: insert-only merges with
    DUPLICATE source keys. Reference semantics (Delta): matched target
    rows are untouched (never duplicated, never raising), and every
    not-matched source OCCURRENCE inserts when its condition holds —
    duplicate new keys insert twice. Zero files rewritten."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    rng = random.Random(seed)
    runner = IncrementalRunner(spark, target_root)
    spec = _mk_spec(f"io{seed}")
    runner.run(spec, SF_DIR)

    keys = [rng.randrange(0, 80) for _ in range(30)]  # dups + matches
    src_rows = [(k, float(k + 2000)) for k in keys]
    mod_i = rng.choice([2, 3])
    res = runner.merge_into(
        spec,
        spark.createDataFrame(src_rows, "k long, sv double"),
        on="t.k = s.k",
        not_matched=[
            ("insert", f"s.k % {mod_i} = 0", {
                "k": "s.k", "part": "s.k % 4", "v": "s.sv",
            })
        ],
    )
    assert res["files_rewritten"] == 0

    tgt_keys = set(range(40))
    expected = [(i, i % 4, float(i * 10)) for i in range(40)]
    expected += [
        (k, k % 4, float(k + 2000))
        for k in keys
        if k not in tgt_keys and k % mod_i == 0
    ]
    got = sorted(
        (int(r["k"]), int(r["part"]), float(r["v"]))
        for r in runner.read_target(spec.name).collect()
    )
    assert got == sorted(expected), f"seed={seed} mod_i={mod_i}"


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_by_source_only_merge_with_duplicate_sources_matches_reference(
    spark, target_root, seed
):
    """ADVICE r8 second class, randomized: by-source-only merges with
    duplicate source matches. Matched target rows survive EXACTLY once;
    unmatched target rows follow the delete condition; nothing inserts."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    rng = random.Random(seed)
    runner = IncrementalRunner(spark, target_root)
    spec = _mk_spec(f"bs{seed}")
    runner.run(spec, SF_DIR)

    keys = [rng.randrange(0, 40) for _ in range(25)]  # heavy dups
    mod_d = rng.choice([3, 5, 7])
    runner.merge_into(
        spec,
        spark.createDataFrame([(k,) for k in keys], "k long"),
        on="t.k = s.k",
        not_matched_by_source=[("delete", f"t.k % {mod_d} = 1")],
    )
    src_keys = set(keys)
    expected = [
        (i, i % 4, float(i * 10))
        for i in range(40)
        if i in src_keys or i % mod_d != 1
    ]
    got = sorted(
        (int(r["k"]), int(r["part"]), float(r["v"]))
        for r in runner.read_target(spec.name).collect()
    )
    assert got == sorted(expected), f"seed={seed} mod_d={mod_d}"
