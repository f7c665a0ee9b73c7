"""Per-group ordinary least squares (y = a + b·x) with exact integer sums.

The drift/trend primitive (metric-over-time slopes, per-segment fits).
Closed-form OLS needs only five sufficient statistics
(n, Σx, Σy, Σxy, Σx²); the whole fit is ONE map-side-combined aggregate —
no iteration, no shuffle beyond the group key.

Determinism design (the module's recurring theme): float sums are
summation-order-dependent, so coordinates integer-scale to ⌊v·2ˢ⌋ first —
the five statistics are then EXACT longs under any partitioning, and both
engines divide identical integers for the final slope/intercept.
Envelope: products are ≤ 2²ˢ, so group sums stay inside int64 while
rows_per_group < 2^(63−2s) (s=16 → two billion rows per group); beyond
that, swap the long sums for DECIMAL(38,0) — the plan shape is unchanged.
Slope/intercept come out in SCALED units; callers un-scale (slope is
scale-free, intercept divides by 2ˢ) — the driver oracle checks the
scaled integers' quotients directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["linreg", "acf"]


def linreg(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_cols: list[str] | None = None,
    scale_bits: int = 16,
) -> DataFrame:
    """Exact-arithmetic per-group OLS fit. Returns
    (group_cols..., n, slope, intercept) where slope/intercept describe
    the least-squares line of scaled-y on scaled-x (slope is unit-free;
    intercept is in scaled-y units). Groups with n < 2 or zero x-variance
    (slope undefined) are dropped."""
    gc = list(group_cols or [])
    s = float(1 << scale_bits)
    ix = F.floor(F.col(x_col) * F.lit(s)).cast("long")
    iy = F.floor(F.col(y_col) * F.lit(s)).cast("long")
    agg = df.select(*gc, ix.alias("_ix"), iy.alias("_iy")).groupBy(*gc).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_ix").alias("sx"),
        F.sum("_iy").alias("sy"),
        F.sum(F.col("_ix") * F.col("_iy")).alias("sxy"),
        F.sum(F.col("_ix") * F.col("_ix")).alias("sxx"),
    )
    # The SUMS fit int64 under the documented envelope, but the normal-
    # equation PRODUCTS (n·sxy, sx·sy, …) square the magnitude again —
    # n·sxx already exceeds 2^63 at ~2k rows/group of day-scale x at s=16.
    # Compute them in decimal(38,0) (exact int128-backed in both Spark and
    # DuckDB-as-HUGEINT), then one cast to double: round-to-nearest on the
    # identical exact integer gives bit-identical quotient operands.
    dec = "decimal(38,0)"
    n_d = F.col("n").cast(dec)
    num = n_d * F.col("sxy").cast(dec) - F.col("sx").cast(dec) * F.col("sy").cast(dec)
    den = n_d * F.col("sxx").cast(dec) - F.col("sx").cast(dec) * F.col("sx").cast(dec)
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return (
        agg.where((F.col("n") >= 2) & (den != 0))
        .select(*gc, "n", slope.alias("slope"), intercept.alias("intercept"))
    )


def acf(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
    order_cols: list[str],
    max_lag: int = 3,
    scale_bits: int = 12,
) -> DataFrame:
    """Per-group lag-k autocorrelation r_k, k = 1..max_lag, of the
    ``order_cols``-ordered sequence of ⌊v·2ˢ⌋-scaled values — the
    seasonality/burstiness probe next to linreg's trend. Uses the standard
    biased estimator r_k = Σᵢ(xᵢ−m)(xᵢ₊ₖ−m) / Σᵢ(xᵢ−m)², expanded into
    SUFFICIENT STATISTICS so every data reduction is an exact int64 sum
    (order-free): with cross_k = Σ xᵢxᵢ₊ₖ, head_k = Σ₁..ₙ₋ₖ xᵢ,
    tail_k = Σₖ₊₁..ₙ xᵢ,

        num_k = cross_k − m·(head_k + tail_k) + (n−k)·m²,   m = sx/n
        den   = sxx − sx·m

    evaluated by one FIXED chain of IEEE ops on identical integers in both
    engines. ``order_cols`` must totally order each group (include a
    unique id) or lead() is nondeterministic. One window shuffle on the
    group key + one map-side-combined aggregate; groups must be
    fine-grained enough to partition (per-entity series, not 5 global
    types, at real scale). Returns (group…, lag, n, r); groups with
    n ≤ max_lag or zero variance drop."""
    gc = list(group_cols)
    s = float(1 << scale_bits)
    w = Window.partitionBy(*gc).orderBy(*[F.col(c) for c in order_cols])
    d = df.select(
        *gc, *order_cols, F.floor(F.col(value_col) * F.lit(s)).cast("long").alias("_x")
    )
    for k in range(1, max_lag + 1):
        d = d.withColumn(f"_l{k}", F.lead("_x", k).over(w))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        aggs += [
            F.sum(F.col("_x") * lk).alias(f"_c{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("_x"))).alias(f"_h{k}"),
            F.sum(lk).alias(f"_t{k}"),
        ]
    a = d.groupBy(*gc).agg(*aggs)
    lags = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("lag"),
                F.col(f"_c{k}").alias("cross"),
                F.col(f"_h{k}").alias("head"),
                F.col(f"_t{k}").alias("tail"),
            )
            for k in range(1, max_lag + 1)
        ]
    )
    e = a.select(*gc, "n", "sx", "sxx", F.explode(lags).alias("p")).select(
        *gc, "n", "sx", "sxx", "p.lag", "p.cross", "p.head", "p.tail"
    )
    nd = F.col("n").cast("double")
    m = F.col("sx").cast("double") / nd
    num = (
        F.col("cross").cast("double")
        - m * (F.col("head") + F.col("tail")).cast("double")
        + (nd - F.col("lag").cast("double")) * m * m
    )
    den = F.col("sxx").cast("double") - F.col("sx").cast("double") * m
    return (
        e.where((F.col("n") > F.col("lag")) & (den != 0.0))
        .select(*gc, "lag", "n", (num / den).alias("r"))
    )


__all__.append("mann_kendall")


def mann_kendall(
    df: DataFrame,
    *,
    group_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    limit: int = 24,
) -> DataFrame:
    """Mann-Kendall trend test per group — the nonparametric drift
    detector (monotone trend without assuming linearity; the statistic
    behind ArcGIS emerging-hot-spot analysis), complementing linreg
    (parametric slope) and acf (autocorrelation). Over each group's first
    ``limit`` values ordered by ``order_col``:

        S    = Σ_{i<j} sign(v_j − v_i)                 (exact int)
        T    = Σ_ties t·(t−1)·(2t+5)                   (exact int)
        varN = n·(n−1)·(2n+5) − T                      (Var_S = varN/18)
        z    = (S∓1)/sqrt(varN/18), 0 when S = 0       (normal approx)

    All statistics reduce to exact int64 per group, computed INSIDE one
    collected array — the O(limit²) pair scan runs as nested Column
    lambdas over the per-group series, so the whole operator is one
    map-side-combined groupBy with zero joins and zero UDFs: the same
    scale shape as linreg regardless of group count. Tie weight uses the
    per-element identity Σ_k t(t−1)(2t+5) = Σ_i (c_i−1)(2c_i+5) with
    c_i = #elements equal to v_i (the DuckDB twin groups ties directly —
    algebraically equal, formulation-independent).

    Returns (group, n, s_stat, var_num, z)."""
    vals = F.slice(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
            ),
            lambda s: s[value_col],
        ),
        1,
        limit,
    )
    g = df.groupBy(F.col(group_col).alias("grp")).agg(vals.alias("v"))
    n = F.size("v")
    idx = F.sequence(F.lit(1), n)
    zero = F.lit(0).cast("long")

    def sgn(w, v):
        return (
            F.when(w > v, 1).when(w < v, -1).otherwise(0).cast("long")
        )

    s_stat = F.aggregate(
        idx,
        zero,
        lambda acc, i: acc
        + F.aggregate(
            F.slice(F.col("v"), i + 1, n - i),
            zero,
            lambda a, w: a + sgn(w, F.element_at("v", i)),
        ),
    )
    c_i = lambda i: F.aggregate(  # noqa: E731
        F.col("v"),
        zero,
        lambda a, w: a + (w == F.element_at("v", i)).cast("long"),
    )
    t_sum = F.aggregate(
        idx,
        zero,
        lambda acc, i: acc + (c_i(i) - 1) * (2 * c_i(i) + 5),
    )
    out = g.select(
        F.col("grp").alias(group_col),
        n.cast("long").alias("n"),
        s_stat.alias("s_stat"),
        (
            n.cast("long") * (n - 1).cast("long") * (2 * n + 5).cast("long")
            - t_sum
        ).alias("var_num"),
    )
    sd = F.sqrt(F.col("var_num").cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double") / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return out.select(
        group_col, "n", "s_stat", "var_num", F.round(z, 12).alias("z")
    )


__all__.append("theil_sen")


def theil_sen(
    df: DataFrame,
    *,
    group_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    limit: int = 24,
) -> DataFrame:
    """Sen's slope estimator per group — the robust trend magnitude that
    standardly pairs with the Mann-Kendall test (mann_kendall says
    WHETHER there is a monotone trend; Theil-Sen says HOW STEEP,
    unperturbed by up to ~29% outliers): the median of all pairwise
    slopes (v_j − v_i)/(j − i) over the group's first ``limit`` values,
    x being the 1-based series rank.

    Same zero-join scale shape as mann_kendall: the O(limit²) slope set
    is built, sorted and median-picked INSIDE the per-group collected
    array with Column lambdas. The median uses the explicit
    avg-of-middles formula (element ⌊(m+1)/2⌋ + element ⌊m/2⌋+1)/2 —
    for odd m both indices coincide and (x+x)/2 = x exactly — so an
    engine whose quantile interpolates differently (a + 0.5·(b−a) is NOT
    the same IEEE double as (a+b)/2) cannot silently diverge: the DuckDB
    twin ranks slopes with row_number and applies the identical formula.
    Groups with fewer than 2 observations have no pairs and are dropped.

    Returns (group, n_pairs, sen_slope)."""
    vals = F.slice(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
            ),
            lambda s: s[value_col],
        ),
        1,
        limit,
    )
    g = df.groupBy(F.col(group_col).alias("grp")).agg(vals.alias("v"))
    n = F.size("v")
    g = g.where(n >= 2)
    slopes = F.array_sort(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, n),
                    lambda j: (
                        F.element_at("v", j.cast("int"))
                        - F.element_at("v", i.cast("int"))
                    )
                    / (j - i).cast("double"),
                ),
            )
        )
    )
    g = g.select("grp", slopes.alias("s"))
    m = F.size("s")
    lo = F.element_at("s", ((m + 1) / 2).cast("int"))
    hi = F.element_at("s", (m / 2).cast("int") + 1)
    return g.select(
        F.col("grp").alias(group_col),
        m.cast("long").alias("n_pairs"),
        F.round((lo + hi) / 2, 12).alias("sen_slope"),
    )


__all__.append("spearman")


def spearman(
    df: DataFrame,
    *,
    group_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    limit: int = 24,
) -> DataFrame:
    """Spearman rank correlation per group — the monotone-association
    companion of linreg/mann_kendall: Pearson correlation of the series
    RANKS, tie-correct (tied values take their average rank, the Spearman
    convention; the shortcut 1 − 6Σd²/(n(n²−1)) is WRONG under ties, so
    this is Pearson-on-ranks by construction).

    Exactness design: x-rank is the 1-based series position (i), y-rank is
    the average tie rank kept as the INTEGER 2·avg = 2·rank() + tie_count
    − 1 (x doubles to 2i to match scale), so all five sufficient sums are
    exact int64 (n ≤ limit ⇒ everything ≤ 2·limit³) and only the final
    ρ = num / √(dx·dy) divides — correctly-rounded IEEE on identical
    integers in both engines. The twin derives 2·avg rank a DIFFERENT way
    (min+max row_number over the tie group) — the identity 2·rank()+cnt−1
    = min_rn+max_rn is what the hash certifies. Groups shorter than 3 or
    with zero rank variance (all-tied y) drop out / yield NULL rho.

    Plan: two windows over the (group, ≤limit) slice + one aggregate —
    the per-group slice is bounded so the windows never sort more than
    ``limit`` rows per key. Returns (group, n, num, rho)."""
    w_ord = Window.partitionBy(group_col).orderBy(order_col)
    base = (
        df.select(group_col, order_col, value_col)
        .withColumn("_i", F.row_number().over(w_ord))
        .where(F.col("_i") <= limit)
    )
    w_val = Window.partitionBy(group_col).orderBy(value_col)
    w_tie = Window.partitionBy(group_col, value_col)
    ranked = base.select(
        F.col(group_col).alias("grp"),
        (F.col("_i") * 2).cast("long").alias("x2"),
        (F.rank().over(w_val) * 2 + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("long")
        .alias("y2"),
    )
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x2").alias("sx"),
        F.sum("y2").alias("sy"),
        F.sum(F.col("x2") * F.col("y2")).alias("sxy"),
        F.sum(F.col("x2") * F.col("x2")).alias("sxx"),
        F.sum(F.col("y2") * F.col("y2")).alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    rho = F.when(
        dx * dy > 0,
        F.round(num.cast("double") / F.sqrt((dx * dy).cast("double")), 12),
    )
    return agg.where(n >= 3).select(
        F.col("grp").alias(group_col),
        n.cast("long").alias("n"),
        num.cast("long").alias("num"),
        rho.alias("rho"),
    )


__all__.append("cusum_changepoint")


def cusum_changepoint(
    df: DataFrame,
    *,
    group_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    limit: int = 24,
    scale: int = 1_000_000,
) -> DataFrame:
    """Single change-point detection per group by the CUSUM criterion: the
    split index t maximizing |n·S_t − t·S_n| (S_t = prefix sum), i.e. the
    point where the mean before/after differs most — the drift-localizer
    that tells a pipeline WHEN a metric shifted (mann_kendall says whether,
    theil_sen how fast, this one where).

    Exactness: values integer-scale to ⌊v·scale⌋ first (the linreg move),
    so prefix sums and the criterion D_t = |n·S_t − t·S_n| are EXACT int64
    under any partitioning (|D| ≤ n²·scale·max|v|; n ≤ limit keeps it far
    inside the envelope) and the argmax (max D, ties to the SMALLEST t) is
    the same in any engine — no float appears anywhere until the optional
    mean gap output. t ranges over 1..n−1 (a split needs both sides
    non-empty); groups with n < 2 drop.

    Plan: zero-join — one collect_list per group, prefix sums and the
    argmax fold INSIDE the array with Column lambdas (aggregate over a
    bounded array), one shuffle total. Returns
    (group, n, t_star, d_star, gap_signed) where gap_signed is the exact
    integer n·S_t − t·S_n at t_star (positive = the early segment's mean
    is higher; divide by t·(n−t)·scale/n for the plain mean difference)."""
    vals = F.slice(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
            ),
            lambda s: F.floor(s[value_col] * scale).cast("long"),
        ),
        1,
        limit,
    )
    g = df.groupBy(F.col(group_col).alias("grp")).agg(vals.alias("v"))
    n = F.size("v")
    g = g.where(n >= 2)
    # prefix sums S_1..S_n as an array fold (exact longs)
    pref = F.aggregate(
        F.col("v"),
        F.array().cast("array<bigint>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(
                    F.size(acc) > 0, F.element_at(acc, F.size(acc))
                ).otherwise(F.lit(0).cast("bigint"))
                + x
            ),
        ),
    )
    g = g.select("grp", F.size("v").alias("n"), pref.alias("s"))
    sn = F.element_at("s", F.col("n").cast("int"))
    # argmax over t = 1..n-1 of |n*S_t - t*S_n|, ties to smallest t:
    # max over structs (d, -t) then re-read the signed value at t*
    cand = F.transform(
        F.sequence(F.lit(1), F.col("n") - 1),
        lambda t: F.struct(
            F.abs(
                F.col("n").cast("bigint") * F.element_at("s", t.cast("int"))
                - t.cast("bigint") * sn
            ).alias("d"),
            (-t).cast("bigint").alias("negt"),
            t.cast("bigint").alias("t"),
        ),
    )
    best = F.array_max(cand)
    signed = (
        F.col("n").cast("bigint")
        * F.element_at("s", F.col("t_star").cast("int"))
        - F.col("t_star") * sn
    )
    return (
        g.select(
            F.col("grp").alias(group_col),
            F.col("n").cast("long").alias("n"),
            best["t"].alias("t_star"),
            best["d"].alias("d_star"),
            "s",
        )
        .select(
            group_col,
            "n",
            "t_star",
            "d_star",
            signed.alias("gap_signed"),
        )
    )


__all__.append("ks_two_sample")


def ks_two_sample(
    df: DataFrame,
    type_a: str,
    type_b: str,
    *,
    group_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance per group — the
    distribution-drift detector (did 'click' values drift from 'view'
    values for this user/segment?): D = max_v |F_a(v) − F_b(v)| over the
    pooled support.

    Exact-integer formulation (the CUSUM move): with sample sizes
    (n_a, n_b) and cumulative counts (C_a, C_b) at each DISTINCT pooled
    value, D·n_a·n_b = max |n_b·C_a − n_a·C_b| — an exact int64 under any
    partitioning (counts only, values never summed), evaluated AFTER each
    tie group so equal values in both samples cancel correctly. Groups
    missing either sample drop.

    Plan: groupBy (group, value, [type counts]) → one cumulative window
    per group ordered by value → max aggregate; shuffle keys are (group)
    — no self-join, no pooled sort wider than a group. Returns
    (group, n_a, n_b, d_int, d_micro) with d_micro = ⌊d_int·10⁶/(n_a·n_b)⌋."""
    f = df.where(F.col(type_col).isin([type_a, type_b])).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        F.when(F.col(type_col) == type_a, 1).otherwise(0).alias("ia"),
    )
    per_v = f.groupBy("grp", "v").agg(
        F.sum("ia").alias("ca"),
        F.sum(F.lit(1) - F.col("ia")).alias("cb"),
    )
    w = Window.partitionBy("grp").orderBy("v")
    wt = Window.partitionBy("grp")
    cum = per_v.select(
        "grp",
        F.sum("ca").over(w).alias("Ca"),
        F.sum("cb").over(w).alias("Cb"),
        F.sum("ca").over(wt).alias("na"),
        F.sum("cb").over(wt).alias("nb"),
    )
    agg = (
        cum.where((F.col("na") > 0) & (F.col("nb") > 0))
        .groupBy("grp")
        .agg(
            F.max(
                F.abs(F.col("nb") * F.col("Ca") - F.col("na") * F.col("Cb"))
            ).alias("d_int"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("d_int").cast("long").alias("d_int"),
        F.floor(F.col("d_int") * 1_000_000 / (F.col("na") * F.col("nb")))
        .cast("long")
        .alias("d_micro"),
    )


__all__.append("isotonic")


def pava_ints(y: "list[int]") -> "list[tuple[int, int]]":
    """Pool-adjacent-violators over integer observations: returns the pool
    list as (sum, count) pairs covering the sequence in order. Violation
    tests are INTEGER cross-multiplications (s_prev·c_cur > s_cur·c_prev),
    so the pooling decision is exact — no float enters until the final
    per-pool mean division."""
    pools: list[list[int]] = []
    for v in y:
        pools.append([int(v), 1])
        while len(pools) > 1 and (
            pools[-2][0] * pools[-1][1] > pools[-1][0] * pools[-2][1]
        ):
            s, c = pools.pop()
            pools[-1][0] += s
            pools[-1][1] += c
    return [(p[0], p[1]) for p in pools]


def isotonic(
    df,
    *,
    group_col: str = "user_id",
    order_col: str = "event_id",
    y_col,
    max_len: int = 32,
) -> "DataFrame":
    """Per-group isotonic (nondecreasing) regression — PAVA (Ayer 1955 /
    Barlow 1972), the probability-calibration staple: replace each group's
    ``order_col``-sorted integer observations with the closest
    nondecreasing sequence in L2, which PAVA produces as consecutive-pool
    means. Series assembly is relational (sort_array over collect_list,
    first ``max_len`` rows per group — the TWED envelope); the O(n) stack
    runs per group in one mapInPandas pass with exact integer violation
    tests.

    Fitted values are rationals S/c with c ≤ max_len: distinct such
    rationals differ by ≥ 1/c₁c₂ — astronomically above double noise — and
    equal rationals divide to IDENTICAL doubles in any IEEE engine, which
    is why the DuckDB twin (the independent minimax closed form
    ŷᵢ = max_{j≤i} min_{l≥i} avg(y_j..y_l), prefix-sum quotients, no PAVA
    stack at all) hash-matches with zero tolerance.

    ``y_col``: a Column producing an INTEGER (long) observation.
    Returns (group, order, iso) exploded back to one row per observation.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    series = df.groupBy(group_col).agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(F.col(order_col).alias("o"), y_col.alias("y")))
            ),
            1,
            max_len,
        ).alias("rows")
    )
    gt = series.schema[group_col].dataType.simpleString()

    def fn(batches):
        for pdf in batches:
            gids, orders, isos = [], [], []
            for gid, rows in zip(pdf[group_col], pdf["rows"]):
                y = [int(r["y"]) for r in rows]
                pos = 0
                for s, c in pava_ints(y):
                    mean = s / c  # one IEEE division per pool
                    for _ in range(c):
                        gids.append(gid)
                        orders.append(rows[pos]["o"])
                        isos.append(mean)
                        pos += 1
            yield pd.DataFrame(
                {
                    group_col: np.asarray(gids),
                    order_col: np.asarray(orders),
                    "iso": np.asarray(isos, dtype=np.float64),
                }
            )

    return series.mapInPandas(
        fn, schema=f"{group_col} {gt}, {order_col} long, iso double"
    )
