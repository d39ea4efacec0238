"""Deterministic sampling, data mixing, and split assignment for
training-corpus construction.

A 100 TB pipeline cannot use ``df.sample()`` for corpus curation:
Bernoulli sampling is non-reproducible across retries/partitions and
can't be audited. Every operator here keys on a content-stable hash of
the document id (``md5(seed || id)``), so:

- the same (seed, id) always lands on the same side of every cut —
  re-running a failed stage, adding executors, or re-partitioning
  never changes the sample;
- split membership (train/val/test) is a pure function of the id, so
  leakage checks are a join, not a provenance hunt;
- the oracle is exact: DuckDB computes the identical predicate.

All pure column expressions — one narrow, shuffle-free projection/
filter pass, fully pushdown-friendly.

Hash construction: first 15 md5 hex chars as a long (uniform on
[0, 16^15)), reduced mod 1e6 -> a uniform "ticket" in [0, 1e6). Rates
are therefore honored to 1e-6 resolution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from my_weather_spark.ops.timeseries import round6_portable

TICKET_MOD = 1_000_000


def _ticket(id_col: str, seed: str) -> Column:
    """Uniform deterministic ticket in [0, 1e6) from (seed, id)."""
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % TICKET_MOD


def _cut(rate: float) -> int:
    """Ticket cutoff for a keep-rate. round(), NOT int(): truncation
    drops one ticket for thousands of exactly-representable decimal
    rates (int(0.0157e6) == 15699), breaking the documented 1e-6
    exactness and any oracle that computes the cut by exact decimal."""
    return int(round(rate * TICKET_MOD))


def hash_sample(
    df: DataFrame,
    rate: float,
    seed: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff ticket(seed, id) < rate * 1e6.

    Deterministic and repartition-invariant, unlike ``df.sample``.
    Different seeds give independent samples of the same corpus.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_ticket(id_col, seed) < _cut(rate))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    default_rate: float = 0.0,
    seed: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum sampling rates — the "data mixing weights" step of
    corpus construction (e.g. keep 100% of books, 8% of crawl).

    The rate map is inlined as an in-row literal map lookup (strata
    counts are small by definition); no join, no shuffle — the filter
    composes with parquet pushdown on ``strata_col``.
    """
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
    pairs = [x for k in sorted(rates) for x in (F.lit(k), F.lit(_cut(rates[k])))]
    cut = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(_cut(default_rate)),
    )
    return df.where(_ticket(id_col, seed) < cut)


def shuffle_key(
    df: DataFrame,
    seed: str = "epoch0",
    id_col: str = "doc_id",
    out_col: str = "shuffle_key",
) -> DataFrame:
    """Attach a deterministic 60-bit shuffle key: the reproducible
    global training order for an epoch.

    Sorting (or range-partitioning) by the key gives the same document
    order on every run and any cluster size; a new ``seed`` per epoch
    reshuffles. Emitting the KEY rather than a rank is deliberate —
    a global row_number would serialize through one partition, while a
    distributed sort / range partition on the key scales.
    """
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    return df.withColumn(
        out_col, F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    )


def split_assign(
    df: DataFrame,
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    labels: tuple[str, ...] = ("train", "val", "test"),
    seed: str = "split",
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Label every row train/val/test by hash bucket — membership is a
    pure function of (seed, id), so no document ever migrates between
    splits as the corpus grows, and val/test stay disjoint from train
    under any re-run.
    """
    if len(weights) != len(labels):
        raise ValueError("weights and labels must have equal length")
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights)}")
    t = _ticket(id_col, seed)
    acc = 0.0
    expr = F.lit(labels[-1])
    cuts = []
    for w, lab in zip(weights[:-1], labels[:-1]):
        acc += w
        cuts.append((_cut(acc), lab))
    for cut, lab in reversed(cuts):
        expr = F.when(t < cut, F.lit(lab)).otherwise(expr)
    return df.withColumn(out_col, expr)


# ----------------------------------------------------------------------
# Temperature-scaled mixing (the multilingual/multi-domain recipe of
# mT5/XLM-R): sample stratum s with probability proportional to
# (n_s)^alpha — alpha < 1 flattens the distribution, upweighting small
# domains/languages without hand-tuned per-stratum rates.
def temperature_cuts(
    df: DataFrame,
    target_total: int,
    alpha: float = 0.5,
    strata_col: str = "source",
) -> DataFrame:
    """(strata_col, n_total, cut) — per-stratum ticket cuts such that
    the expected kept total is ``target_total`` distributed as
    p_s ∝ n_s^alpha (N^alpha cancels out of the normalized form, so
    raw counts suffice). Per-stratum keep rate
    r_s = min(1, target_total * p_s / n_s); cut = floor(r*1e6 + 0.5)
    capped at 1e6.

    Engine-portable by construction at alpha=0.5: weights are
    IEEE-sqrt (correctly rounded, unlike pow/ln/exp which are only
    faithfully rounded and may differ across libm implementations —
    other alphas work operationally but are not oracle-exact), and the
    weight-sum folds LEFT over the strata sorted by name (Spark
    F.aggregate == DuckDB list_reduce over list(... ORDER BY)), so
    both engines add the same doubles in the same order.

    Scale shape: one map-side-combined count aggregate (strata
    cardinality is small by definition) + a one-row broadcast
    crossjoin of the fold — the scalar-subquery pattern.
    """
    if target_total < 0:
        raise ValueError(f"target_total must be >= 0, got {target_total}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_total"))
    n_dbl = F.col("n_total").cast("double")
    w = F.sqrt(n_dbl) if alpha == 0.5 else F.pow(n_dbl, F.lit(float(alpha)))
    weighted = counts.withColumn("_w", w)
    wsum = weighted.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(strata_col, "_w"))),
                lambda x: x["_w"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("_wsum")
    )
    rate_scaled = (
        F.lit(float(target_total)) * F.col("_w") / F.col("_wsum")
        / F.col("n_total") * F.lit(float(TICKET_MOD))
    )
    cut = F.least(
        F.lit(float(TICKET_MOD)), F.floor(rate_scaled + F.lit(0.5))
    ).cast("long")
    return weighted.join(F.broadcast(wsum)).select(
        strata_col, "n_total", cut.alias("cut")
    )


def temperature_sample(
    df: DataFrame,
    target_total: int,
    alpha: float = 0.5,
    strata_col: str = "source",
    seed: str = "",
    id_col: str = "doc_id",
    _cuts: DataFrame | None = None,
) -> DataFrame:
    """Keep each row iff its hash ticket clears its stratum's
    temperature cut — deterministic, repartition/retry-invariant, and
    composable with the other ticket samplers (same ticket space).
    The cuts frame (strata-cardinality rows) broadcasts onto the
    corpus: one broadcast hash join + filter, no corpus shuffle.
    ``_cuts`` lets a caller that already built the cuts reuse them.
    Rows with a NULL stratum are dropped (equality join semantics —
    no cut is defined for them; identical in the SQL oracle)."""
    cuts = (
        _cuts
        if _cuts is not None
        else temperature_cuts(df, target_total, alpha, strata_col)
    )
    return (
        df.join(F.broadcast(cuts.select(strata_col, "cut")), strata_col)
        .where(_ticket(id_col, seed) < F.col("cut"))
        .select(*df.columns)
    )


def unimax_alloc(
    df: DataFrame,
    epochs: int = 2,
    budget_chars: int | None = None,
    budget_ratio: tuple[int, int] = (7, 4),
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023): allocate a total
    character budget across languages, giving every language the
    uniform share of what remains EXCEPT those whose full corpus fits
    within ``epochs`` repetitions under that share — they are capped
    at ``epochs`` epochs and the freed budget is re-divided among the
    rest. Returns one row per stratum:
    (strata_col, n_chars, capped, alloc_chars, epochs).

    The paper's ascending-size loop collapses to window arithmetic:
    once a language is uncapped, every larger one is too (the uniform
    share is invariant from that point — removing an uncapped language
    removes exactly one share), so the capped set is a prefix of the
    (n_chars, strata) ordering. A language at rank k is capped iff
    n_k * E * (L - k + 1) < B - E * prefix_sum(n) — ALL-INT64
    comparisons, so the decision replays bit-exactly in SQL; only the
    final uniform share and the epochs readout are rational
    (round6_portable on both engines). Ties (n*E == share) take the
    uniform branch — the allocation is identical either way, only the
    capped flag is convention.

    ``budget_chars`` sets B absolutely; when None, B derives in-plan
    as total_chars * budget_ratio (integer DIV — exact in both
    engines), keeping the mixing plan scale-invariant.

    Scale shape: ONE map-side-combined aggregate over the corpus
    (per-stratum char sums); everything after runs on the
    strata-cardinality frame — the windows are single-task by
    construction because language counts are small by definition, the
    same bound as temperature_cuts. NULL strata are dropped on both
    engines (Spark and DuckDB disagree on NULL sort order), and so
    are strata with zero countable characters — they carry nothing
    allocatable, and the paper loop divides by their size."""
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    if budget_chars is not None and budget_chars < 1:
        raise ValueError(f"budget_chars must be >= 1, got {budget_chars}")
    num, den = budget_ratio
    if budget_chars is None and (num < 1 or den < 1):
        raise ValueError(f"budget_ratio must be positive, got {budget_ratio}")
    sizes = (
        df.filter(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(
            F.sum(F.length(F.coalesce(F.col(text_col), F.lit(""))))
            .cast("long")
            .alias("n_chars")
        )
        .filter(F.col("n_chars") > 0)
    )
    tot = sizes.agg(
        F.sum("n_chars").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_n_strata"),
    )
    budget = (
        F.lit(int(budget_chars)).cast("long")
        if budget_chars is not None
        else F.expr(f"CAST((_total * {int(num)}) DIV {int(den)} AS BIGINT)")
    )
    e = F.lit(int(epochs)).cast("long")
    w = Window.orderBy("n_chars", strata_col)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    w_full = Window.partitionBy(F.lit(1))
    ranked = (
        sizes.join(F.broadcast(tot))
        .withColumn("_budget", budget)
        .withColumn("_k", F.row_number().over(w).cast("long"))
        .withColumn(
            "_s", F.coalesce(F.sum("n_chars").over(w_prev), F.lit(0)).cast("long")
        )
        .withColumn(
            "_cond",
            (
                F.col("n_chars") * e * (F.col("_n_strata") - F.col("_k") + 1)
                < F.col("_budget") - e * F.col("_s")
            ).cast("int"),
        )
        .withColumn("capped", F.min("_cond").over(w_run) == 1)
        .withColumn(
            "_capsum",
            F.sum(F.when(F.col("capped"), F.col("n_chars")).otherwise(0))
            .over(w_full)
            .cast("long"),
        )
        .withColumn(
            "_m",
            F.sum(F.col("capped").cast("long")).over(w_full).cast("long"),
        )
    )
    alloc_raw = F.when(
        F.col("capped"), (F.col("n_chars") * e).cast("double")
    ).otherwise(
        (F.col("_budget") - e * F.col("_capsum")).cast("double")
        / (F.col("_n_strata") - F.col("_m"))
    )
    return ranked.select(
        strata_col,
        "n_chars",
        "capped",
        round6_portable(alloc_raw).alias("alloc_chars"),
        round6_portable(alloc_raw / F.col("n_chars")).alias("epochs"),
    )
