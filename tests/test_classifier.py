"""Model-based quality classifier (functions/classifier.py): NB
log-odds closed form vs a pure-Python reference and a DuckDB join
oracle; distributed logistic regression convergence, determinism, and
separation on a constructed good/junk corpus."""

import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from markdown_lab_spark.functions.classifier import (
    BIAS_TERM,
    doc_terms,
    featurize,
    nb_logodds_weights,
    score_docs,
    train_logreg,
)

# good docs: prose-shaped; junk docs: keyword-stuffed
GOOD = [
    "the study explains how rivers carry sediment to the sea",
    "a clear introduction to how plants convert light into energy",
    "this chapter describes how the heart pumps blood through the body",
    "students learn how fractions represent parts of a whole",
    "the essay examines how trade routes shaped early cities",
    "a guide that explains how vaccines train the immune system",
]
JUNK = [
    "buy cheap pills online casino bonus click here free",
    "casino casino bonus free spins click subscribe now win",
    "cheap replica watches free shipping buy now limited offer",
    "win big jackpot online casino free bonus click click",
    "free followers instant click here buy cheap likes now",
    "limited offer buy now cheap deals click subscribe win",
]


def _labeled(spark):
    rows = [(i, t, True) for i, t in enumerate(GOOD)] + [
        (100 + i, t, False) for i, t in enumerate(JUNK)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


# ---- pure-Python reference -------------------------------------------------
def _ref_terms(text):
    toks = [t for t in text.lower().strip().split() if t]
    return toks + [" ".join(p) for p in zip(toks, toks[1:])]


def _ref_nb(rows, min_df=1, alpha=1.0):
    npos = sum(1 for _, _, y in rows if y)
    nneg = len(rows) - npos
    dfp, dfn = Counter(), Counter()
    for _, t, y in rows:
        for term in set(_ref_terms(t)):
            (dfp if y else dfn)[term] += 1
    w = {}
    for term in set(dfp) | set(dfn):
        if dfp[term] + dfn[term] < min_df:
            continue
        w[term] = math.log((dfp[term] + alpha) / (npos + 2 * alpha)) - math.log(
            (dfn[term] + alpha) / (nneg + 2 * alpha)
        )
    w[BIAS_TERM] = math.log((npos + alpha) / (nneg + alpha))
    return w


def _ref_score(text, w):
    terms = _ref_terms(text)
    if terms:
        tf = Counter(terms)
        dot = sum(w.get(t, 0.0) * c / len(terms) for t, c in tf.items())
    else:
        dot = 0.0
    m = dot + w.get(BIAS_TERM, 0.0)
    return 1.0 / (1.0 + math.exp(-m))


def test_doc_terms_unigrams_and_bigrams(spark):
    out = (
        spark.createDataFrame([("  The Quick  fox ",)], "t string")
        .select(doc_terms(F.col("t")).alias("terms"))
        .first()["terms"]
    )
    assert out == ["the", "quick", "fox", "the quick", "quick fox"]


def test_featurize_tf_normalized(spark):
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, t string")
    feats = {
        r["term"]: r["x"] for r in featurize(df, "doc_id", "t").collect()
    }
    # terms: a a b + "a a" "a b" -> 5 total
    assert feats == {
        "a": pytest.approx(2 / 5),
        "b": pytest.approx(1 / 5),
        "a a": pytest.approx(1 / 5),
        "a b": pytest.approx(1 / 5),
    }


def test_nb_weights_match_pure_python(spark):
    df = _labeled(spark)
    got = {
        r["term"]: r["wt"]
        for r in nb_logodds_weights(df, "doc_id", "text", "y").collect()
    }
    rows = [(r["doc_id"], r["text"], r["y"]) for r in df.collect()]
    want = _ref_nb(rows)
    assert set(got) == set(want)
    for t, v in want.items():
        assert got[t] == pytest.approx(v, abs=1e-12), t


def test_nb_scoring_separates_and_matches_reference(spark):
    df = _labeled(spark)
    w = nb_logodds_weights(df, "doc_id", "text", "y")
    scored = {r["doc_id"]: r["score"] for r in score_docs(df, w, "doc_id", "text").collect()}
    rows = [(r["doc_id"], r["text"], r["y"]) for r in df.collect()]
    ref_w = _ref_nb(rows)
    for i, t, y in rows:
        assert scored[i] == pytest.approx(_ref_score(t, ref_w), abs=1e-9)
        assert (scored[i] > 0.5) == y  # training docs separate cleanly


def test_scoring_oov_and_empty_docs_get_prior(spark):
    train = _labeled(spark)
    w = nb_logodds_weights(train, "doc_id", "text", "y")
    bias = [r["wt"] for r in w.collect() if r["term"] == BIAS_TERM][0]
    oov = spark.createDataFrame(
        [(1, "zzz qqq"), (2, "")], "doc_id long, text string"
    )
    scored = {r["doc_id"]: r["score"] for r in score_docs(oov, w, "doc_id", "text").collect()}
    prior = 1.0 / (1.0 + math.exp(-bias))
    assert scored[1] == pytest.approx(prior, abs=1e-12)
    assert scored[2] == pytest.approx(prior, abs=1e-12)


def test_min_df_and_vocab_size_prune(spark):
    df = _labeled(spark)
    w_all = nb_logodds_weights(df, "doc_id", "text", "y").count()
    w_df2 = nb_logodds_weights(df, "doc_id", "text", "y", min_df=2).count()
    w_top = nb_logodds_weights(df, "doc_id", "text", "y", vocab_size=10).count()
    assert w_df2 < w_all
    assert w_top == 11  # 10 terms + bias row


def test_nb_train_and_score_matches_duckdb_oracle(spark):
    """Full closed-form train+score parity against an independent DuckDB
    formulation (the q68 gate shape, at test scale)."""
    df = _labeled(spark)
    w = nb_logodds_weights(df, "doc_id", "text", "y", min_df=2)
    got = {
        r["doc_id"]: round(r["score"], 6)
        for r in score_docs(df, w, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs(doc_id BIGINT, text VARCHAR, y BOOLEAN)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?)",
        [(r["doc_id"], r["text"], r["y"]) for r in df.collect()],
    )
    sql = r"""
    WITH tok AS (
      SELECT doc_id, y,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS w
      FROM docs
    ),
    uni AS (
      SELECT doc_id, y, w[i] AS term
      FROM tok, UNNEST(generate_series(1, len(w))) AS t(i)
    ),
    bi AS (
      SELECT doc_id, y, w[i] || ' ' || w[i+1] AS term
      FROM tok, UNNEST(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
    ),
    terms AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
    cls AS (
      SELECT count(*) FILTER (y) AS npos,
             count(*) FILTER (NOT y) AS nneg
      FROM docs
    ),
    pres AS (SELECT DISTINCT doc_id, y, term FROM terms),
    dfc AS (
      SELECT term,
             count(*) FILTER (y) AS dfp,
             count(*) FILTER (NOT y) AS dfn
      FROM pres GROUP BY term HAVING count(*) >= 2
    ),
    wts AS (
      SELECT term,
             ln((dfp + 1.0) / (npos + 2.0)) - ln((dfn + 1.0) / (nneg + 2.0))
               AS wt
      FROM dfc CROSS JOIN cls
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS cnt FROM terms GROUP BY doc_id, term
    ),
    tot AS (SELECT doc_id, sum(cnt) AS n FROM tf GROUP BY doc_id),
    feat AS (
      SELECT tf.doc_id, tf.term, tf.cnt / tot.n AS x
      FROM tf JOIN tot USING (doc_id)
    ),
    dot AS (
      SELECT f.doc_id, sum(f.x * w.wt) AS m
      FROM feat f JOIN wts w USING (term) GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           round(1.0 / (1.0 + exp(-(coalesce(dot.m, 0)
                 + ln((cls.npos + 1.0) / (cls.nneg + 1.0))))), 6) AS score
    FROM docs d CROSS JOIN cls LEFT JOIN dot ON dot.doc_id = d.doc_id
    """
    want = {int(i): float(s) for i, s in con.execute(sql).fetchall()}
    assert got == pytest.approx(want)


def test_logreg_loss_decreases_and_separates(spark):
    df = _labeled(spark)
    w, losses = train_logreg(df, "doc_id", "text", "y", iters=6, l2=1e-3)
    assert len(losses) == 6
    assert losses[-1] < losses[0]
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:]))
    scored = {r["doc_id"]: r["score"] for r in score_docs(df, w, "doc_id", "text").collect()}
    for r in df.collect():
        assert (scored[r["doc_id"]] > 0.5) == r["y"]
    # discriminative refinement should sharpen the fit vs NB init
    nb_w = nb_logodds_weights(df, "doc_id", "text", "y")
    nb_scored = {
        r["doc_id"]: r["score"]
        for r in score_docs(df, nb_w, "doc_id", "text").collect()
    }

    def _ll(s):
        return sum(
            -math.log(max(s[r["doc_id"]] if r["y"] else 1 - s[r["doc_id"]], 1e-12))
            for r in df.collect()
        )

    assert _ll(scored) < _ll(nb_scored)


def test_logreg_deterministic_across_runs(spark):
    df = _labeled(spark)
    w1, l1 = train_logreg(df, "doc_id", "text", "y", iters=3)
    w2, l2 = train_logreg(df, "doc_id", "text", "y", iters=3)
    assert l1 == l2
    a = {r["term"]: r["wt"] for r in w1.collect()}
    b = {r["term"]: r["wt"] for r in w2.collect()}
    assert a == b


def test_logreg_generalizes_to_held_out(spark):
    df = _labeled(spark)
    w, _ = train_logreg(df, "doc_id", "text", "y", iters=6)
    held = spark.createDataFrame(
        [
            (1, "the teacher explains how clouds form rain", True),
            (2, "click here free casino bonus buy cheap now", False),
        ],
        "doc_id long, text string, y boolean",
    )
    scored = {r["doc_id"]: r["score"] for r in score_docs(held, w, "doc_id", "text").collect()}
    assert scored[1] > 0.5 > scored[2]


def test_score_plan_has_no_python_udf(spark):
    df = _labeled(spark)
    w = nb_logodds_weights(df, "doc_id", "text", "y")
    plan = score_docs(df, w, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
