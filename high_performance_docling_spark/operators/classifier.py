"""Distributed logistic-regression quality classifier.

The fasttext-style quality filter every pretraining pipeline runs
(keep/drop by a trained linear model over cheap text features), built
the same way kmeans_fit builds the IVF quantizer: full-batch gradient
descent where each iteration is ONE map-side-combined aggregation over
the corpus and the model state collected to the driver is 4 floats.
At 100 TB the per-iteration cost is a single scan + 4-double partial
aggregate per partition — no shuffle wider than the agg's 1-row merge,
no driver-side data beyond the weight vector.

Deterministic and engine-portable so a DuckDB oracle can replay the
whole fit in unrolled SQL (the kmeans/BPE replay pattern):
  - features are exact IEEE expressions (integer counts + divisions,
    identical across engines);
  - the margin z is rounded to 9 decimals before exp() so a 1-ulp
    exp-input difference cannot arise;
  - weights are rounded to 6 decimals after each update so avg()
    fold-order noise cannot flip later iterations;
  - iteration 1 starts at w=0 → p is exactly 0.5 in both engines.

Labels are a deterministic heuristic (stopword ratio + length), so the
trained model is a smooth distillation of the rule — the shape real
quality classifiers take (label source: heuristics or an LLM judge;
serving: a linear model cheap enough for 10^12 docs).

Reference role: quality gating before the per-doc stages (the
reference's confidence thresholds, /root/reference/fork/
document_assembler.py) — here as a trained, corpus-fit filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FEATURES = ("x0", "x1", "x2", "x3")
STOPWORDS = ("the", "and", "of", "to", "a", "in")


def lr_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact cross-engine features + heuristic label.

    x0 bias; x1 capped token count, centered at the 50-token label
    threshold; x2 stopword ratio centered at the 0.05 threshold; x3
    mean token length centered near its corpus mode — all pure
    projections (no UDF, no shuffle). Centering/scaling matters: raw
    features leave full-batch GD stuck at the majority class inside
    any reasonable iteration budget. Label y=1 iff
    stopword_ratio >= 0.05 and n_tokens >= 50 (the 'looks like running
    prose' rule)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(1.0).alias("x0"),
        (
            (F.least(n_tok, F.lit(500)) / F.lit(500.0) - F.lit(0.1))
            * F.lit(5.0)
        ).alias("x1"),
        (((stop + F.lit(0.0)) / n_tok - F.lit(0.05)) * F.lit(20.0)).alias(
            "x2"
        ),
        (
            (F.length(text_col) + F.lit(0.0)) / n_tok / F.lit(10.0)
            - F.lit(0.6)
        ).alias("x3"),
        F.when(
            ((stop + F.lit(0.0)) / n_tok >= 0.05) & (n_tok >= 50), F.lit(1.0)
        )
        .otherwise(F.lit(0.0))
        .alias("y"),
    )


def _margin(w: list[float]):
    z = F.lit(0.0)
    for x, wj in zip(FEATURES, w):
        z = z + F.col(x) * F.lit(wj)
    return F.round(z, 9)


def lr_fit(feats: DataFrame, n_iter: int = 8, lr: float = 5.0) -> list[float]:
    """Full-batch GD: w_j += lr * avg((y - sigmoid(w·x)) * x_j), weights
    rounded to 6 decimals per update. Like kmeans_fit this RUNS Spark
    jobs (n_iter 1-row collects) — registry job-free-test exempt."""
    w = [0.0] * len(FEATURES)
    for _ in range(n_iter):
        z = _margin(w)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = feats.agg(
            *[
                F.avg((F.col("y") - p) * F.col(x)).alias(f"g{j}")
                for j, x in enumerate(FEATURES)
            ]
        ).collect()[0]
        w = [round(wj + lr * float(row[f"g{j}"]), 6) for j, wj in enumerate(w)]
    return w


def lr_score(feats: DataFrame, w: list[float]) -> DataFrame:
    """Serve the fitted model: pure literal-weight projection, zero
    shuffle (the IVF assign shape). pred compares the rounded margin to
    0 (== p >= 0.5) so the decision never goes through exp()."""
    z = _margin(w)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        F.col("y").cast("int").alias("label"),
        F.when(z >= 0, F.lit(1)).otherwise(F.lit(0)).alias("pred"),
        (F.round(p, 6) + F.lit(0.0)).alias("score"),
    )


def lr_iter_sql(n_iter: int = 8, lr: float = 5.0) -> str:
    """DuckDB CTE chain replaying lr_fit byte-for-byte: w0 = zeros, then
    p{k} (sigmoid of the 9-rounded margin under w{k-1}) and w{k}
    (6-rounded update). Compose after an `f` CTE providing
    doc_id, x0..x3, y."""
    dot = "w.a0*x0 + w.a1*x1 + w.a2*x2 + w.a3*x3"
    parts = ["w0 AS (SELECT 0.0 AS a0, 0.0 AS a1, 0.0 AS a2, 0.0 AS a3)"]
    for k in range(1, n_iter + 1):
        parts.append(
            f"p{k} AS (SELECT f.*, w.a0, w.a1, w.a2, w.a3,\n"
            f"  1.0/(1.0 + exp(-round({dot}, 9))) AS p\n"
            f"  FROM f CROSS JOIN w{k - 1} w)"
        )
        upd = ",\n".join(
            f"  round(a{j} + {lr!r} * avg((y - p) * x{j}), 6) AS a{j}"
            for j in range(4)
        )
        parts.append(
            f"w{k} AS (SELECT\n{upd}\n  FROM p{k} GROUP BY a0, a1, a2, a3)"
        )
    return ",\n".join(parts)
