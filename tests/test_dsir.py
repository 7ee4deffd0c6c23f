"""DSIR importance resampling — closed-form references, a full-pipeline
DuckDB cross-oracle, determinism drills, and plan guards."""

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.functions.dsir import (
    dsir_logweights,
    dsir_resample,
    fit_hashed_ngram_model,
    hashed_ngram_terms,
)
from markdown_lab_spark.plans.checks import (
    assert_broadcast_join,
    assert_no_partitionless_window,
)

B = 64  # small bucket count so tiny corpora still collide like real ones


def _bucket(gram: str, buckets: int = B) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % buckets


def _py_terms(text: str, buckets: int = B):
    toks = text.lower().split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = {}
    for g in grams:
        b = _bucket(g, buckets)
        out[b] = out.get(b, 0) + 1
    return out


def _py_uniform(salt: str, key) -> float:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


RAW = [
    (0, "the cat sat on the mat"),
    (1, "stock market prices rose sharply today"),
    (2, "the dog sat on the log"),
    (3, "buy cheap pills online now cheap pills"),
    (4, "a cat and a dog sat together quietly"),
    (5, "click here to win money now click here"),
    (6, "the bird sat on the wire at dawn"),
    (7, ""),
]
TARGET = [
    (100, "the cat sat on the soft mat"),
    (101, "a small dog sat by the door"),
    (102, "the bird sang while the cat sat near"),
]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(RAW, "doc_id long, content string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(TARGET, "doc_id long, content string")


def test_terms_match_python_reference(spark, raw):
    got = {
        (r["id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_terms(raw, "doc_id", "content", B).collect()
    }
    expect = {}
    for i, text in RAW:
        for b, c in _py_terms(text).items():
            expect[(i, b)] = c
    assert got == expect


def test_model_is_dense_and_normalized(spark, target):
    rows = fit_hashed_ngram_model(target, "doc_id", "content", B, alpha=0.5).collect()
    assert len(rows) == B
    assert sorted(r["bucket"] for r in rows) == list(range(B))
    assert math.fsum(math.exp(r["logp"]) for r in rows) == pytest.approx(1.0, abs=1e-9)


def _py_model(docs, alpha=1.0, buckets=B):
    counts = {}
    for _, text in docs:
        for b, c in _py_terms(text, buckets).items():
            counts[b] = counts.get(b, 0) + c
    total = sum(counts.values())
    return {
        b: math.log((counts.get(b, 0) + alpha) / (total + alpha * buckets))
        for b in range(buckets)
    }


def _py_logweights(alpha=1.0, buckets=B):
    pt = _py_model(TARGET, alpha, buckets)
    pr = _py_model(RAW, alpha, buckets)
    out = {}
    for i, text in RAW:
        out[i] = math.fsum(
            c * (pt[b] - pr[b]) for b, c in _py_terms(text, buckets).items()
        )
    return out


def test_logweights_match_python_reference(spark, raw, target):
    tm = fit_hashed_ngram_model(target, "doc_id", "content", B)
    rm = fit_hashed_ngram_model(raw, "doc_id", "content", B)
    w = dsir_logweights(raw, "doc_id", "content", tm, rm, B)
    got = {r["id"]: r["logweight"] for r in w.collect()}
    expect = _py_logweights()
    assert set(got) == set(expect)
    for i in expect:
        assert got[i] == pytest.approx(expect[i], rel=1e-9, abs=1e-12)
    # target-like docs (cat/dog/sat vocabulary) outscore spam
    assert got[0] > got[3] and got[4] > got[5] and got[2] > got[1]
    # a doc with no n-grams carries no evidence
    assert got[7] == 0.0


def test_resample_matches_duckdb_oracle(spark, raw, target):
    k = 4
    picked = dsir_resample(raw, "doc_id", "content", target, k, buckets=B).collect()
    assert len(picked) == k
    assert [r["rank"] for r in sorted(picked, key=lambda r: -r["gumbel"])] == [
        1,
        2,
        3,
        4,
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE raw(doc_id BIGINT, content VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", RAW)
    con.execute("CREATE TABLE tgt(doc_id BIGINT, content VARCHAR)")
    con.executemany("INSERT INTO tgt VALUES (?, ?)", TARGET)
    charv = "(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1)"

    def hex8(h):
        return " + ".join(
            f"{charv.format(h=h, i=i + 1)} * {16 ** (7 - i)}" for i in range(8)
        )

    terms_sql = """
        SELECT doc_id AS id, ({bucket}) AS bucket, count(*) AS cnt
        FROM (
          SELECT doc_id, md5(g) AS gh
          FROM (
            SELECT doc_id,
                   list_concat(
                     words,
                     list_transform(range(1, len(words)),
                                    i -> words[i] || ' ' || words[i+1])
                   ) AS grams
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(lower(content)), '\\s+') AS words
                  FROM {tbl}
                  WHERE trim(content) <> '')
          ), unnest(grams) AS t(g)
        )
        GROUP BY doc_id, bucket
    """.replace("{bucket}", f"({hex8('gh')}) % {B}")
    model_sql = f"""
        SELECT b.bucket,
               ln((coalesce(c.n, 0) + 1.0) / (t.total + 1.0 * {B})) AS logp
        FROM (SELECT unnest(range({B})) AS bucket) b
        LEFT JOIN (SELECT bucket, sum(cnt) AS n
                   FROM ({{terms}}) GROUP BY bucket) c USING (bucket)
        CROSS JOIN (SELECT coalesce(sum(cnt), 0) AS total FROM ({{terms}})) t
    """
    raw_terms = terms_sql.replace("{tbl}", "raw")
    tgt_terms = terms_sql.replace("{tbl}", "tgt")
    oracle = con.execute(
        f"""
        WITH rawm AS ({model_sql.replace('{terms}', raw_terms)}),
             tgtm AS ({model_sql.replace('{terms}', tgt_terms)}),
             w AS (
               SELECT r.doc_id,
                      coalesce(s.lw, 0.0) AS logweight
               FROM raw r
               LEFT JOIN (
                 SELECT t.id AS doc_id,
                        sum(t.cnt * (tm.logp - rm.logp)) AS lw
                 FROM ({raw_terms}) t
                 JOIN tgtm tm USING (bucket)
                 JOIN rawm rm USING (bucket)
                 GROUP BY t.id
               ) s ON r.doc_id = s.doc_id
             ),
             g AS (
               SELECT doc_id, logweight,
                      logweight - ln(-ln(({hex8("md5('dsir:' || doc_id)")}) / 4294967296.0))
                        AS gumbel
               FROM w
             )
        SELECT doc_id, logweight, gumbel FROM g
        ORDER BY gumbel DESC, doc_id LIMIT {k}
        """
    ).fetchall()
    assert {r["doc_id"] for r in picked} == {r[0] for r in oracle}
    got = {r["doc_id"]: (r["logweight"], r["gumbel"]) for r in picked}
    for doc_id, lw, gb in oracle:
        assert got[doc_id][0] == pytest.approx(lw, rel=1e-9, abs=1e-12)
        assert got[doc_id][1] == pytest.approx(gb, rel=1e-9, abs=1e-12)


def test_resample_stable_under_repartitioning(spark, raw, target):
    a = {r["doc_id"] for r in dsir_resample(raw, "doc_id", "content", target, 3, B).collect()}
    b = {
        r["doc_id"]
        for r in dsir_resample(
            raw.repartition(7, "content"), "doc_id", "content", target, 3, B
        ).collect()
    }
    assert a == b


def test_plan_shape(spark, raw, target):
    tm = fit_hashed_ngram_model(target, "doc_id", "content", B)
    rm = fit_hashed_ngram_model(raw, "doc_id", "content", B)
    w = dsir_logweights(raw, "doc_id", "content", tm, rm, B)
    assert_broadcast_join(w)  # the delta model table broadcasts
    sel = dsir_resample(raw, "doc_id", "content", target, 3, B)
    assert_no_partitionless_window(sel)  # top-k has no Window node


def test_input_validation(spark, raw, target):
    with pytest.raises(ValueError):
        hashed_ngram_terms(raw, "doc_id", "content", 0)
    with pytest.raises(ValueError):
        fit_hashed_ngram_model(raw, "doc_id", "content", B, alpha=0.0)
    with pytest.raises(ValueError):
        dsir_resample(raw, "doc_id", "content", target, 0, B)
