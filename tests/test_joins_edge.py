"""Join edge cases on constructed inputs (FIXTURES.md nulls_joins spec):
null keys, unmatched rows, as-of tie semantics — plus a hypothesis
property proving the as-of window formulation against a naive model."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k long, v string"
    )
    right = spark.createDataFrame(
        [(1, "x"), (None, "y"), (3, "z")], "k long, w string"
    )
    inner = left.join(right, left.k == right.k).collect()
    assert len(inner) == 1 and inner[0][1] == "a"  # null != null in joins

    louter = left.join(right, left.k == right.k, "left").collect()
    assert len(louter) == 3  # null-key and unmatched rows preserved

    semi = left.join(right, left.k == right.k, "left_semi").collect()
    anti = left.join(right, left.k == right.k, "left_anti").collect()
    assert {r.v for r in semi} == {"a"}
    assert {r.v for r in anti} == {"b", "c"}  # null key lands in anti

    # null-safe equality DOES match nulls
    nsafe = left.join(right, left.k.eqNullSafe(right.k)).collect()
    assert {r.v for r in nsafe} == {"a", "b"}


def _asof_engine(spark, rows):
    """The engine's as-of formulation (operators.joins.join_asof) over
    constructed (user, ts, kind) rows; kind 'v'=view, 'p'=purchase."""
    df = spark.createDataFrame(
        [(u, i, t, k) for i, (u, t, k) in enumerate(rows)],
        "user_id long, event_id long, ts_us long, kind string",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn(
            "last_view_us",
            F.max(F.when(F.col("kind") == "v", F.col("ts_us"))).over(w),
        )
        .where(F.col("kind") == "p")
        .collect()
    )
    return {r.event_id: r.last_view_us for r in out}


@settings(max_examples=20, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.integers(min_value=0, max_value=50),  # ts (collisions likely)
            st.sampled_from(["v", "p"]),
        ),
        max_size=25,
    )
)
def test_asof_matches_naive_model(spark, rows):
    got = _asof_engine(spark, rows)
    # naive model: for purchase at (t, idx), latest view of same user with
    # (ts, idx) <= (t, idx) in the (ts, event_id) order the engine uses
    for i, (u, t, k) in enumerate(rows):
        if k != "p":
            continue
        candidates = [
            tv
            for j, (u2, tv, k2) in enumerate(rows)
            if u2 == u and k2 == "v" and (tv, j) <= (t, i)
        ]
        want = max(candidates) if candidates else None
        assert got[i] == want


def test_vecs_known_cosines(spark):
    """FIXTURES.md vecs_known: identical / orthogonal / opposite vectors
    through the engine's dot-product expression."""
    rows = [
        (0, [1.0, 0.0] + [0.0] * 62),
        (1, [1.0, 0.0] + [0.0] * 62),   # identical -> cos 1
        (2, [0.0, 1.0] + [0.0] * 62),   # orthogonal -> cos 0
        (3, [-1.0, 0.0] + [0.0] * 62),  # opposite -> cos -1
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ed = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(ed, F.lit(0.0), lambda acc, x: acc + x * x))
    n = v.select("vec_id", ed.alias("e"), norm.alias("nrm"))
    a, b = n.alias("a"), n.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.e"), F.col("b.e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = {
        (r.ia, r.ib): r.cos
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cos"),
        )
        .collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == 0.0
    assert pairs[(0, 3)] == -1.0


def test_register_views_enables_sql(spark, sf_dir):
    from shippinglanes_spark.io import register_views

    register_views(spark, sf_dir)
    out = spark.sql(
        "SELECT r_name, COUNT(*) AS n FROM nation "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ).collect()
    assert len(out) == 5 and all(r.n == 5 for r in out)


def test_csv_permissive_bad_records(spark, tmp_path):
    """Schema'd CSV reads tolerate malformed rows via PERMISSIVE mode +
    _corrupt_record capture (lake-ingest robustness)."""
    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,alpha\nnot_an_int,beta\n3,gamma\n")
    df = spark.read.csv(
        str(p),
        header=True,
        schema="k long, v string, _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.k for r in good} == {1, 3}
    assert len(bad) == 1 and "not_an_int" in bad[0]._corrupt_record
