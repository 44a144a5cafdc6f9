"""Deterministic corpus sampling — reproducible training-data downsampling.

``rand()``-based sampling is non-reproducible across runs/planners and
unstable under retries (a recomputed partition draws new randoms — rows
flicker in and out of the sample). Hash sampling decides per ROW KEY:
``md5(salt || key) < threshold`` — the same row is always in or always out,
across runs, partitionings, engines, and retries. That determinism is what
makes a 100-TB sample auditable (any engine can re-derive membership) and
is why the oracle twin (DuckDB ``md5``) matches bit-for-bit.

Scale: a pure JVM Column predicate in the scan — no shuffle, no UDF, no
state; pushdown-friendly (the filter runs before anything else).

Reference parity: the reference samples nothing (it crawls everything);
this is part of the training-data battery the engine adds on top.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"  # unit separator: never appears in keys worth sampling on


def rate_to_hex(rate: float, digits: int = 8) -> str:
    """Inclusion threshold for ``substr(md5, 1, digits) < threshold``.

    The first ``digits`` hex chars of md5 are uniform on [0, 16^digits);
    lexicographic compare of lowercase hex == numeric compare, identically
    in every engine that prints lowercase md5 (Spark, DuckDB, Python).
    ``rate >= 1.0`` returns ``'g'*digits``, which sorts after every hex
    string — keep-all must be expressible exactly (a strict ``<`` against
    ``'ffffffff'`` would drop the ~1-in-2^32 rows whose prefix IS
    ``ffffffff``, i.e. a couple of real rows per 10^10)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g" * digits
    n = int(rate * 16**digits)
    # float rounding can push rates in (1 - 2^-33, 1) up to exactly
    # 16^digits — formatted, that is a 9-char '100000000' which sorts
    # BELOW most 8-char hex strings and would keep ~6% instead of ~100%
    if n >= 16**digits:
        return "g" * digits
    return format(n, f"0{digits}x")


def _key_hash(key_cols: list[str], salt: str) -> Column:
    # NULL keys are coalesced to a sentinel BEFORE concat_ws, which would
    # otherwise silently skip them — (a, NULL, b) must not hash like
    # (a, b, NULL), and a NULL-keyed population must not move in and out
    # of the sample as one block.
    return F.substring(
        F.md5(
            F.concat_ws(
                _SEP,
                F.lit(salt),
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                    for c in key_cols
                ],
            )
        ),
        1,
        8,
    )


def hash_sample(
    df: DataFrame, key_cols: list[str], rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, decided deterministically by key hash.
    Change ``salt`` to draw an independent sample of the same corpus."""
    return df.where(_key_hash(key_cols, salt) < F.lit(rate_to_hex(rate)))


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test split: adds a ``split`` column by
    carving the md5 hash space into contiguous bands sized by
    ``fractions`` (must sum to <= 1; the remainder, if any, is labeled
    ``NULL`` and can be filtered). Same key → same split, forever, on any
    engine — a doc can never leak from train to test between runs, which
    is the whole point. One scan projection; no shuffle."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    h = _key_hash(key_cols, salt)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        # float-summing 0.7+0.15+0.15 lands just UNDER 1.0; snapping the
        # last band to the keep-all sentinel keeps the 'ffffffff'-prefix
        # keys from falling out of every split
        hi = F.lit(rate_to_hex(1.0 if cum >= 1.0 - 1e-9 else cum))
        cond = h < hi
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    target_weights: dict[str, float],
    total: int,
    key_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Resample the corpus toward a target mixture: ``target_weights``
    gives the desired share of each stratum in a ``total``-row output
    (e.g. web 0.6, books 0.3, code 0.1 — the pre-training data-mixing
    step). Per-stratum rates are derived from the actual stratum counts
    (one aggregate; the per-stratum dict is tiny driver state) and capped
    at 1.0 — an under-supplied stratum contributes everything it has and
    the result is proportionally short, which is reported honestly rather
    than silently re-normalized (the caller chooses whether to re-weight).

    Membership is then decided by the same deterministic md5 rule as
    :func:`stratified_hash_sample` — reproducible across runs, engines
    and partitionings. Scale: one count aggregate + one scan predicate;
    nothing else."""
    weights = {k: float(v) for k, v in target_weights.items()}
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("target_weights must sum to a positive value")
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rates = {
        k: min((w / wsum) * total / counts[k], 1.0)
        for k, w in weights.items()
        if counts.get(k)
    }
    return stratified_hash_sample(
        df, strata_col, rates, default_rate=0.0, key_cols=key_cols, salt=salt
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Per-stratum rates (e.g. keep 50% of ``en``, 20% of the rest) — the
    corpus-rebalancing primitive. Same per-key determinism; the threshold
    is a branch-free CASE on the stratum, still a single scan predicate.

    ``key_cols`` must identify rows (e.g. the doc id). It is required:
    hashing the stratum value itself would give every row of a stratum
    the SAME hash, turning a 50% rate into all-or-nothing."""
    if not key_cols:
        raise ValueError(
            "stratified sampling needs row-identifying key_cols; hashing "
            f"the stratum column {strata_col!r} alone would include or "
            "exclude each stratum wholesale"
        )
    keys = key_cols
    thr: Column = F.lit(rate_to_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(rate_to_hex(rate))
        ).otherwise(thr)
    return df.where(_key_hash(keys, salt) < thr)


def upsample_to_mixture(
    df: DataFrame,
    strata_col: str,
    target_weights: dict[str, float],
    total: int,
    key_cols: list[str],
    max_epochs: int = 4,
    salt: str = "",
    counts: dict | None = None,
) -> DataFrame:
    """Epoch-aware mixture resampling: like :func:`mixture_sample`, but a
    stratum whose target EXCEEDS its supply is repeated — multiple
    epochs, the LLaMA/Gopher recipe where small high-quality sources
    (wiki, books) go around more than once while web is sampled down.
    Adds an ``epoch`` column (0-based copy index) so downstream
    shuffling/packing can key on ``(id, epoch)`` and spread the copies.

    Per stratum: rate ``r = target / count`` (one tiny count aggregate,
    same driver-map contract as ``mixture_sample``). Every member row
    gets ``floor(r)`` full epochs; membership in the single extra epoch
    is the same deterministic md5 predicate as :func:`hash_sample`
    under an epoch-distinct salt. ``max_epochs`` bounds repetition
    (beyond ~4 epochs repetition stops helping — Muennighoff et al.
    2023, "Scaling Data-Constrained Language Models"); a capped stratum
    contributes exactly ``max_epochs`` epochs, reported honestly rather
    than silently re-normalized. Strata without a target weight are
    dropped (rate 0), like ``mixture_sample``.

    Scale: one count aggregate, then a scan-side CASE + sequence/explode
    — no shuffle; output size = sum of achieved targets.

    ``counts`` lets a caller that already aggregated the strata (e.g.
    :func:`temperature_mixture`, which derives the weights FROM the
    counts) pass them in and skip the second count job.
    """
    if not key_cols:
        raise ValueError("upsampling needs row-identifying key_cols")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    weights = {k: float(v) for k, v in target_weights.items()}
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("target_weights must sum to a positive value")
    if counts is None:
        counts = {
            r[strata_col]: r["n"]
            for r in df.groupBy(strata_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    n_full_expr: Column = F.lit(0)
    thr_expr: Column = F.lit(rate_to_hex(0.0))
    for value in sorted(weights):
        if not counts.get(value):
            continue
        rate = (weights[value] / wsum) * total / counts[value]
        n_full = int(rate)
        if n_full >= max_epochs:
            n_full, frac = max_epochs, 0.0
        else:
            frac = rate - n_full
        is_v = F.col(strata_col) == value
        n_full_expr = F.when(is_v, F.lit(n_full)).otherwise(n_full_expr)
        thr_expr = F.when(is_v, F.lit(rate_to_hex(frac))).otherwise(thr_expr)
    extra = F.when(
        _key_hash(key_cols, f"{salt}:extra") < thr_expr, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_n_copies", n_full_expr + extra)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    total: int,
    key_cols: list[str],
    max_epochs: int = 4,
    salt: str = "",
) -> DataFrame:
    """Temperature-smoothed mixture: target share of stratum ``i`` is
    ``n_i^alpha / sum_j n_j^alpha`` — the multilingual/multi-source
    rebalancing rule of XLM (Conneau & Lample 2019, alpha=0.5) and mT5
    (Xue et al. 2021, alpha=0.3). ``alpha=1`` keeps the natural
    distribution; ``alpha=0`` forces uniform shares; in between, head
    strata (English, Common Crawl) are sampled down while tail strata
    (low-resource languages, curated sources) are sampled up — with
    :func:`upsample_to_mixture` epoch semantics when a tail target
    exceeds its supply, capped at ``max_epochs``.

    Determinism note for cross-engine replay: ``alpha=0.5`` uses
    ``math.sqrt``, which IEEE 754 requires to be CORRECTLY ROUNDED —
    so the per-stratum weights (and therefore every epoch count and
    md5 threshold) are bit-identical in any compliant engine (the
    DuckDB oracle twin reproduces them exactly; proven in
    ``tests/test_sampling_packing.py``). Generic ``alpha`` goes through
    libm ``pow``, which is only faithfully rounded — same rows in
    practice, but the last ulp of a rate is implementation-defined.
    Weight summation is in sorted-stratum order on both sides.

    Scale: ONE count aggregate (reused for the epoch plan — ``counts``
    is passed through), then a scan-side CASE + explode; no shuffle.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:  # empty input: empty output with the epoch column
        return df.withColumn("epoch", F.lit(0)).where(F.lit(False))
    weights = {
        k: (math.sqrt(counts[k]) if alpha == 0.5 else float(counts[k]) ** alpha)
        for k in sorted(counts, key=str)
        if k is not None
    }
    return upsample_to_mixture(
        df,
        strata_col,
        weights,
        total=total,
        key_cols=key_cols,
        max_epochs=max_epochs,
        salt=salt,
        counts=counts,
    )


def cap_per_group(
    df,
    group_cols: list[str],
    key_cols: list[str],
    max_rows: int,
    salt: str = "",
):
    """Deterministic per-group row cap (the RefinedWeb/C4 per-domain
    cap: no single host may dominate the corpus). Keeps the ``max_rows``
    rows of each group with the smallest md5 order key — i.e. a uniform
    without-replacement sample per group, stable across runs, engines
    and partitionings (same md5-keyed contract as ``hash_sample``).

    ONE window over the group key; at 10^10 rows the groups are hosts
    (millions of small groups), so the rank never sees a giant
    partition — and a skewed mega-host is exactly the row the cap
    exists to cut."""
    from pyspark.sql import Window as W

    okey = _key_hash(key_cols, salt)
    w = W.partitionBy(*group_cols).orderBy(okey, *key_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_rows)
        .drop("_rk")
    )
