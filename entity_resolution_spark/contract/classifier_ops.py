"""Driver-contract row for the distributed Naive Bayes classifier
(operators/classifier.py).

Train on the deterministic 'train' split of the documents corpus (same
sha256-salted split as split_assign), predict language on the held-out
rows, emit (doc_id, lang, pred_lang). The whole model — counts, Laplace
log-likelihoods, priors, argmax — is replicated in DuckDB SQL below, so
the driver hashes the *prediction* of a genuinely trained model, not a
canned table. Log terms are rounded to 10 decimals on both sides to pin
the one libm-dependent function (ln); see nb_train(round_terms=...).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sampling import split_thresholds
from ..queries import _t, query

_ALPHA = 1.0
_ROUND = 10
_TRAIN_BOUND = dict(split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1}))["train"]


@query(
    "nb_lang_predictions",
    f"""
    WITH d AS (
      SELECT doc_id, lang,
             substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
               < '{_TRAIN_BOUND}' AS is_train,
             string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS w
      FROM documents
    ),
    tr_tok AS (
      SELECT lang AS label, unnest(w) AS token FROM d WHERE is_train
    ),
    counts AS (
      SELECT label, token, count(*) AS c
      FROM tr_tok WHERE token <> '' GROUP BY 1, 2
    ),
    v AS (SELECT count(DISTINCT token) AS v FROM counts),
    tot AS (SELECT label, sum(c) AS tot FROM counts GROUP BY 1),
    ntr AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d WHERE is_train),
    lab AS (
      SELECT p.label,
             round(ln(p.cnt / ntr.n), {_ROUND}) AS log_prior,
             round(ln({_ALPHA} / (coalesce(tot.tot, 0) + {_ALPHA} * v.v)),
                   {_ROUND}) AS log_default
      FROM (SELECT lang AS label, count(*) AS cnt FROM d WHERE is_train GROUP BY 1) p
      LEFT JOIN tot USING (label) CROSS JOIN v CROSS JOIN ntr
    ),
    lik AS (
      SELECT counts.label, counts.token,
             round(ln((counts.c + {_ALPHA}) / (tot.tot + {_ALPHA} * v.v)),
                   {_ROUND}) AS loglik
      FROM counts JOIN tot USING (label) CROSS JOIN v
    ),
    te_tok AS (
      SELECT doc_id, unnest(w) AS token FROM d WHERE NOT is_train
    ),
    hist AS (
      SELECT doc_id, token, count(*) AS cnt
      FROM te_tok WHERE token <> '' GROUP BY 1, 2
    ),
    sc AS (
      SELECT hist.doc_id, lab.label,
             sum(hist.cnt * coalesce(lik.loglik, lab.log_default)) AS tok_score
      FROM hist CROSS JOIN lab
      LEFT JOIN lik ON lik.label = lab.label AND lik.token = hist.token
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.doc_id, lab.label,
             lab.log_prior + coalesce(sc.tok_score, 0.0) AS score
      FROM d CROSS JOIN lab
      LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.label = lab.label
      WHERE NOT d.is_train
    ),
    rk AS (
      SELECT doc_id, label,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, label ASC) AS rk
      FROM scored
    )
    SELECT d.doc_id, d.lang, rk.label AS pred_lang
    FROM rk JOIN d USING (doc_id)
    WHERE rk.rk = 1
    """,
)
def nb_lang_predictions(spark, sf_dir):
    """Train NB on the 'train' split; predict lang on held-out docs."""
    from ..operators.classifier import nb_predict, nb_train
    from ..operators.sampling import deterministic_split

    docs = deterministic_split(
        _t(spark, sf_dir, "documents"), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    train = docs.where(F.col("split") == "train")
    held = docs.where(F.col("split") != "train")
    model = nb_train(train, text_col="text", label_col="lang", alpha=_ALPHA, round_terms=_ROUND)
    preds = nb_predict(held, model, text_col="text", id_col="doc_id")
    return held.select("doc_id", "lang").join(preds, "doc_id").select(
        "doc_id", "lang", F.col("pred_label").alias("pred_lang")
    )
